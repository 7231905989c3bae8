"""Convert the reference repo's runtime data assets into this package's own formats.

The reference (steb6/ISBFSAR) ships two data contracts the pipeline depends on
(see SURVEY.md §2.7):

- ``assets/skeleton_types.pkl``: dict of skeleton formats, each with
  ``indices`` (joint selection out of the 122-joint superset), ``names`` and
  ``edges`` (bone connectivity). The live pipeline uses ``smpl+head_30``
  (reference hpe.py:38-39, utils/params.py:5).
- ``assets/32_to_122.npy``: a (32, 122) float32 matrix expanding MetrABS's 32
  predicted joints to the 122-joint superset (reference hpe.py:37,162).

We re-serialize them into a single compressed ``.npz`` per skeleton plus the
expansion matrix, so the framework has no pickle dependency at runtime.

Run:  python tools/convert_assets.py [--reference /root/reference]
"""

import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HERE = os.path.dirname(os.path.abspath(__file__))
OUT_DIR = os.path.join(HERE, "..", "isbfsar_tpu", "assets")


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--reference", default="/root/reference")
    args = parser.parse_args()

    os.makedirs(OUT_DIR, exist_ok=True)

    with open(os.path.join(args.reference, "assets", "skeleton_types.pkl"), "rb") as f:
        skeleton_types = pickle.load(f)

    arrays = {}
    for name, spec in skeleton_types.items():
        key = name.replace("+", "_plus_")
        arrays[f"{key}__indices"] = np.asarray(spec["indices"], dtype=np.int32)
        arrays[f"{key}__edges"] = np.asarray(spec["edges"], dtype=np.int32)
        arrays[f"{key}__names"] = np.asarray(spec["names"], dtype=np.str_)
    np.savez_compressed(os.path.join(OUT_DIR, "skeletons.npz"), **arrays)

    expand = np.load(os.path.join(args.reference, "assets", "32_to_122.npy"))
    np.save(os.path.join(OUT_DIR, "joints_32_to_122.npy"), expand.astype(np.float32))

    # NTU-RGBD-120 class list (plain data: "A{n}. name." lines).
    src = os.path.join(args.reference, "assets", "nturgbd_classes.txt")
    with open(src, "r", encoding="utf-8") as f:
        lines = f.read()
    with open(os.path.join(OUT_DIR, "nturgbd_classes.txt"), "w", encoding="utf-8") as f:
        f.write(lines)

    print(f"Wrote assets to {os.path.abspath(OUT_DIR)}")


if __name__ == "__main__":
    main()
