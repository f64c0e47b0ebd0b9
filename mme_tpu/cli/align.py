"""Forced-alignment CLI (the reference's repurposed ``images_nn.py``
``__main__``, ``SingleModels/images_nn.py:323-334``): compute per-utterance
(start_sec, end_sec) timings for every row of a dataset pickle and write
them back as the ``timings`` column.

Emissions come from any CTC character model. The reference uses
torchaudio's WAV2VEC2_ASR_BASE_960H bundle (not in this image); here
emissions are read from ``--emissions_dir/<row_index>.npy`` (log-prob
[T, C] arrays produced by whatever CTC model is available) together with a
``--labels`` file naming the CTC vocabulary (one char per line, blank
first).

    python -m mme_tpu.cli.align data.pkl --emissions_dir em/ \
        --labels ctc_labels.txt --out data_timed.pkl
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def load_labels(path: str) -> dict:
    with open(path) as f:
        chars = [line.rstrip("\n") for line in f]
    return {c: i for i, c in enumerate(chars) if i > 0}  # 0 = blank


def main(argv=None):
    p = argparse.ArgumentParser("mme_tpu forced alignment")
    p.add_argument("pickle", help="dataset pickle with text/audio columns")
    p.add_argument("--emissions_dir", required=True,
                   help="dir of <row>.npy CTC log-prob emissions")
    p.add_argument("--labels", required=True,
                   help="CTC label file, blank first, one char per line")
    p.add_argument("--out", default=None, help="output pickle path")
    p.add_argument("--text_col", default="text")
    p.add_argument("--sample_rate", type=int, default=16000)
    p.add_argument("--num_samples_col", default="audio_shape")
    args = p.parse_args(argv)

    import pandas as pd
    from mme_tpu.data.alignment import utterance_bounds

    df = pd.read_pickle(args.pickle)
    char2id = load_labels(args.labels)
    timings = []
    for i, (_, row) in enumerate(df.iterrows()):
        em_path = os.path.join(args.emissions_dir, f"{i}.npy")
        if not os.path.exists(em_path):
            timings.append(None)
            continue
        em = np.load(em_path)
        n_samples = int(row.get(args.num_samples_col,
                                em.shape[0] * 320))
        timings.append(utterance_bounds(em, str(row[args.text_col]),
                                        char2id, n_samples,
                                        args.sample_rate))
    df = df.assign(timings=timings)
    out = args.out or args.pickle.replace(".pkl", "_timed.pkl")
    df.to_pickle(out)
    aligned = sum(t is not None for t in timings)
    print(f"aligned {aligned}/{len(df)} rows → {out}")
    return out


if __name__ == "__main__":
    main()
