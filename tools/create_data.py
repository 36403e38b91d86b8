#!/usr/bin/env python
"""Dataset preparation CLI — ``tools/create_data.py`` counterpart
(``/root/reference/tools/create_data.py``).

  python tools/create_data.py nuscenes --root-path data/nuscenes \
      --out-dir data/nuscenes
  python tools/create_data.py nuscenes_ssl --root-path data/nuscenes \
      --out-dir data/nuscenes
  python tools/create_data.py gt_database --root-path data/nuscenes \
      --ann-file nuscenes_infos_train.pkl --out-dir data/nuscenes
  python tools/create_data.py waymo --root-path data/waymo \
      --out-dir data/waymo --max-sweeps 5
  # infos only (KITTI-format tree already on disk; no waymo devkit needed):
  python tools/create_data.py waymo_infos --root-path data/waymo/kitti_format
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from geomae_tpu.data import converters  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("task", choices=["nuscenes", "nuscenes_ssl",
                                    "gt_database", "waymo", "waymo_infos",
                                    "kitti", "lyft"])
    p.add_argument("--root-path", default="data/nuscenes")
    p.add_argument("--out-dir", default="data/nuscenes")
    p.add_argument("--version", default="v1.0-trainval")
    p.add_argument("--max-sweeps", type=int, default=10)
    p.add_argument("--ann-file", default="nuscenes_infos_train.pkl")
    args = p.parse_args()

    if args.task in ("nuscenes", "nuscenes_ssl"):
        converters.create_nuscenes_infos(
            args.root_path, args.out_dir, version=args.version,
            max_sweeps=args.max_sweeps, ssl=args.task == "nuscenes_ssl")
    elif args.task == "waymo":
        # raw TFRecords -> KITTI format -> infos (needs waymo devkit + tf)
        from geomae_tpu.data import waymo_converter
        waymo_converter.convert_waymo_raw(args.root_path, args.out_dir,
                                          max_sweeps=args.max_sweeps)
    elif args.task == "waymo_infos":
        # KITTI-format tree -> info pkls (pure numpy; devkit-free)
        from geomae_tpu.data import waymo_converter
        waymo_converter.create_waymo_info_file(args.root_path,
                                               max_sweeps=args.max_sweeps)
    elif args.task == "kitti":
        from geomae_tpu.data import kitti_converter
        kitti_converter.create_kitti_info_file(args.root_path,
                                               save_path=args.out_dir)
    elif args.task == "lyft":
        converters.create_lyft_infos(args.root_path, args.out_dir,
                                     version=args.version,
                                     max_sweeps=args.max_sweeps)
    else:
        converters.create_groundtruth_database(
            args.root_path, args.ann_file, args.out_dir)


if __name__ == "__main__":
    main()
