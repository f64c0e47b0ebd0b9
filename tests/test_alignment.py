"""CTC forced-alignment tests with a synthetic known-truth emission."""

import numpy as np

import jax.numpy as jnp

from mme_tpu.data.alignment import (backtrack, ctc_trellis, merge_repeats,
                                    normalize_transcript, utterance_bounds)


def _emission_for(seq, num_frames, num_classes, spans):
    """Log-prob emission strongly favoring `seq[k]` during spans[k], blank
    elsewhere."""
    em = np.full((num_frames, num_classes), -10.0, np.float32)
    em[:, 0] = -0.5  # blank fairly likely everywhere (like real CTC)
    for tok, (s, e) in zip(seq, spans):
        em[s:e, tok] = 0.0  # token beats blank only inside its span
    # normalize to log-probs
    em = em - np.log(np.exp(em).sum(-1, keepdims=True))
    return em


def test_normalize_transcript():
    assert normalize_transcript("Hello, World! 21") == "hello world twenty one"
    assert normalize_transcript("it's 100%!") == "it's one hundred"
    assert normalize_transcript("3   dogs") == "three dogs"


def test_alignment_recovers_spans():
    seq = [5, 3, 7]  # token ids
    spans = [(10, 15), (20, 26), (30, 36)]
    em = _emission_for(seq, 50, 10, spans)
    trellis = np.asarray(ctc_trellis(jnp.asarray(em), jnp.asarray(seq)))
    path = backtrack(trellis, em, seq)
    assert path is not None
    segs = merge_repeats(path, "abc")
    assert len(segs) == 3
    # recovered segments overlap the planted spans
    for seg, (s, e) in zip(segs, spans):
        assert seg.start < e and seg.end > s, (seg, s, e)


def test_utterance_bounds():
    # vocabulary: 0=blank, a=4, b=5
    char2id = {"a": 4, "b": 5, "|": 6}
    seq_spans = [(8, 12), (14, 18)]
    em = _emission_for([4, 5], 40, 10, seq_spans)
    bounds = utterance_bounds(em, "AB", char2id, num_samples=40 * 320,
                              sample_rate=16000)
    assert bounds is not None
    start, end = bounds
    # frame 8..18 of 40 frames over 0.8 s
    assert 0.1 < start < 0.25
    assert 0.25 < end < 0.45


def test_unalignable_returns_none():
    char2id = {"a": 4}
    em = np.full((5, 10), -0.1, np.float32)  # nothing distinctive
    em[:, 4] = -20.0  # token 'a' impossible → backtrack fails or aligns all
    out = utterance_bounds(em, "aaaaaaaaaa", char2id, num_samples=1600)
    # ten tokens cannot fit in five frames → None
    assert out is None


def test_align_cli_roundtrip(tmp_path):
    """The forced-alignment CLI writes timings back to the pickle
    (reference images_nn.py:323-334 contract)."""
    import pandas as pd
    from mme_tpu.cli import align as align_cli

    df = pd.DataFrame({"text": ["ab", "ba"], "audio_shape": [40 * 320] * 2})
    pkl = tmp_path / "d.pkl"
    df.to_pickle(pkl)

    labels = tmp_path / "labels.txt"
    labels.write_text("-\n|\n'\na\nb\n")  # blank, |, ', a=3, b=4

    emdir = tmp_path / "em"
    emdir.mkdir()
    np.save(emdir / "0.npy", _emission_for([3, 4], 40, 8,
                                           [(8, 12), (14, 18)]))
    # no emission for row 1 → timings None

    out = align_cli.main([str(pkl), "--emissions_dir", str(emdir),
                          "--labels", str(labels)])
    res = pd.read_pickle(out)
    t0 = res["timings"].iloc[0]
    assert t0 is not None and 0.0 < t0[0] < t0[1]
    assert res["timings"].iloc[1] is None
