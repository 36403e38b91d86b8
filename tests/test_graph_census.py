"""Primitive-census regression pin for the TPU-path pretrain step.

Hidden sorts are the expensive failure mode of this codebase's history:
``searchsorted(method='sort')`` lowers to a full sort per call, unsorted
scatters lower to sorts, and one of them sneaking back into the hot graph
costs ~10% of step time silently (ARCHITECTURE.md round-3 census notes).
This test traces the REAL TPU-path train step (backend detection patched,
abstract eval only — never compiles) and pins the sort/scatter budget, so
a regression fails CI instead of costing a bench round.

Counts are verified shape-independent: the small-caps trace here matches
the full bench-caps trace (9 sorts / 0 scatters / 27 pallas_calls,
2026-08 round 5: the dense-BEV targets scatter became the Pallas expand
kernel).
"""
import importlib.util
import os
import sys

import jax
import pytest

_TOOLS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools")


def _load_census():
    spec = importlib.util.spec_from_file_location(
        "graph_census", os.path.join(_TOOLS, "graph_census.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules.setdefault("graph_census", mod)
    spec.loader.exec_module(mod)
    return mod.census


# Budget per primitive for the jitted pretrain step, TPU path.  Every
# entry below is ACCOUNTED FOR — if you add a legitimate sort/scatter,
# update the pin in the same change and note the new consumer here:
#   sort (9): voxelize canonical sort_key_val (2 eqns: key sort +
#     table-key compaction), window layout argsorts (windows.py
#     :101-102 = 4 across the two shift configs), encoder visible-set
#     compaction (mae.py = 2), decoder mask-token merge (mae.py).
#   scatter (0): the dense-BEV target moments build became the Pallas
#     expand kernel (round 5) — no XLA scatters remain in the step.
PINNED = {"sort": 9, "scatter": 0, "scatter_add": 0}


@pytest.mark.slow
def test_pretrain_step_primitive_budget():
    census = _load_census()
    from geomae_tpu.config import CapsConfig, geomae_pretrain_nus, replace
    from geomae_tpu.train.pretrain import (dummy_batch, init_state,
                                           make_train_step)

    cfg = geomae_pretrain_nus()
    cfg = replace(cfg, caps=CapsConfig(max_points=16384, max_voxels=2560,
                                       max_visible=1024))
    state, tx = init_state(cfg, 2, jax.random.PRNGKey(0))

    # patch AFTER init (init executes a jit; tracing alone never lowers)
    import geomae_tpu.models.sst as sstm
    import geomae_tpu.ops.pallas_segreduce as psr
    orig = sstm._is_tpu_backend, psr._on_tpu
    sstm._is_tpu_backend = lambda: True
    psr._on_tpu = lambda: True
    try:
        step = make_train_step(cfg, tx)
        cnt, locs = census(step, state, dummy_batch(cfg, 2),
                           jax.random.PRNGKey(1))
    finally:
        sstm._is_tpu_backend, psr._on_tpu = orig

    for prim, budget in PINNED.items():
        got = cnt.get(prim, 0)
        assert got == budget, (
            f"{prim} count changed: {got} (pinned {budget}). "
            f"Locations: {dict(locs[prim])} — if intentional, update "
            f"PINNED and the accounting comment in this test.")
    # the TPU path must actually be the pallas path
    assert cnt.get("pallas_call", 0) >= 20
