from . import checkpoint, finetune, optim, pretrain, schedules, state, trainer  # noqa: F401,E501
