"""Cross-gate A/B for the knn-moments cap (max_number_neighbors).

Round-3 measurement (docs/PARITY.md): mnn=40 cuts the 500-frame urban
drive 0.564 -> 0.463 %Tr for ~10 % driving fps and +0.001 corridor APE.
Round-4 task: re-measure at head across BOTH gates and decide whether to
adopt 40 in the driving profile (the ≤0.5 %Tr north star, VERDICT task 3).

The cap is a dynamic scalar — variants share every compiled program.

  PYTHONPATH=/root/repo python -u tools/ab_mnn.py [mnn ...] [--long-frames N]
"""

import dataclasses
import json
import sys

sys.path.insert(0, "/root/repo")


def main():
    import ct_icp_tpu.config.options as O

    variants = [int(a) for a in sys.argv[1:] if a.isdigit()] or [20, 40]
    long_frames = None
    if "--long-frames" in sys.argv:
        long_frames = int(sys.argv[sys.argv.index("--long-frames") + 1])

    orig = O.default_driving_profile
    import bench

    for mnn in variants:
        def patched(mnn=mnn):
            o = orig()
            return dataclasses.replace(
                o, ct_icp_options=dataclasses.replace(
                    o.ct_icp_options, max_number_neighbors=mnn))
        O.default_driving_profile = patched
        d = bench.run_driving()
        lo = bench.run_long(long_frames)
        print(json.dumps({
            "mnn": mnn,
            "driving_fps": d["value"], "driving_ape": d["mean_ape_m"],
            "driving_ape_per_seed": d["ape_per_seed"],
            "long_tr": lo["value"], "long_tr_per_seed": lo["tr_per_seed"],
            "long_fps": lo["frames_per_sec"],
            "long_failures": lo["failures"],
        }), flush=True)
    O.default_driving_profile = orig


if __name__ == "__main__":
    main()
