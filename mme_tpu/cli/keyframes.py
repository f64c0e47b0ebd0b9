"""Keyframe-extraction CLI — the reference's Katna offline step
(``/root/reference/run_scripts/Katna_Proc.py:16-75``): 16 keyframes per
video, written into a per-video folder under a per-split root
(``{split}_KeyFrameFolder/{video_basename}/``), consumed at train time via
``MME_KEYFRAME_GLOB`` (the reference's ``getKatna`` glob,
``models/tav.py:123-160``).

    python -m mme_tpu.cli.keyframes data.pkl --out_root data/keyframes
    # then: MME_KEYFRAME_GLOB='data/keyframes/{split}_KeyFrameFolder/{name}/*.jpg'

Selection is scene-change scoring with uniform temporal coverage
(data/videodec.py::extract_keyframes) instead of Katna's clustering — same
contract, no external dependency.
"""

from __future__ import annotations

import argparse
import os


def video_name(path: str) -> str:
    return os.path.splitext(os.path.basename(str(path)))[0]


def main(argv=None):
    p = argparse.ArgumentParser("mme_tpu keyframe extraction")
    p.add_argument("pickle", help="dataset pickle with a video-path column")
    p.add_argument("--out_root", required=True)
    p.add_argument("--video_col", default="video_path")
    p.add_argument("--split_col", default="split")
    p.add_argument("--num_frames", type=int, default=16)
    args = p.parse_args(argv)

    import pandas as pd

    from mme_tpu.data.videodec import extract_keyframes

    df = pd.read_pickle(args.pickle)
    done, failed = 0, 0
    seen = set()
    for _, row in df.iterrows():
        path = row.get(args.video_col, None)
        if path is None or str(path) in seen:
            continue
        seen.add(str(path))
        split = str(row.get(args.split_col, "train"))
        out_dir = os.path.join(args.out_root, f"{split}_KeyFrameFolder",
                               video_name(path))
        try:
            extract_keyframes(str(path), out_dir, args.num_frames)
            done += 1
        except Exception as e:  # keep going over a corrupt video
            print(f"FAILED {path}: {e}", flush=True)
            failed += 1
    pattern = os.path.join(args.out_root, "{split}_KeyFrameFolder",
                           "{name}", "*.jpg")
    print(f"extracted keyframes for {done} videos ({failed} failed)")
    print(f"MME_KEYFRAME_GLOB pattern: {pattern}")
    return {"done": done, "failed": failed, "pattern": pattern}


if __name__ == "__main__":
    main()
