"""CTC forced alignment (offline L0 capability).

Reference: ``SingleModels/images_nn.py:71-200`` / ``run_scripts/get_times.py``
— wav2vec2-CTC emissions → trellis DP → backtrack → merge repeats →
per-utterance (start_sec, end_sec) word timings written into the dataset
pickles. TPU-native redesign: the trellis recursion is a ``lax.scan`` over
time with the token axis vectorized (the reference loops in Python per
frame); backtracking stays on host (inherently sequential, O(T) scalar).

Any CTC character model works as the emission source; the reference uses
torchaudio's WAV2VEC2_ASR_BASE_960H bundle (``images_nn.py:328``).
"""

from __future__ import annotations

import dataclasses
import re
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

NEG_INF = -1e30

_ONES = "zero one two three four five six seven eight nine".split()
_TEENS = ("ten eleven twelve thirteen fourteen fifteen sixteen seventeen "
          "eighteen nineteen").split()
_TENS = ("twenty thirty forty fifty sixty seventy eighty ninety").split()


def _num_to_words(n: int) -> str:
    """Minimal num2words for 0..999999 (the reference depends on the
    num2words package, ``images_nn.py:145-187``; transcripts rarely exceed
    this range)."""
    if n < 10:
        return _ONES[n]
    if n < 20:
        return _TEENS[n - 10]
    if n < 100:
        t, r = divmod(n, 10)
        return _TENS[t - 2] + (f" {_ONES[r]}" if r else "")
    if n < 1000:
        h, r = divmod(n, 100)
        return f"{_ONES[h]} hundred" + (f" {_num_to_words(r)}" if r else "")
    th, r = divmod(n, 1000)
    return f"{_num_to_words(th)} thousand" + (f" {_num_to_words(r)}" if r else "")


def normalize_transcript(text: str) -> str:
    """Lowercase, expand digits to words, strip punctuation — the CTC label
    mapping preprocessing (``images_nn.py:145-187``)."""
    text = text.lower()
    text = re.sub(r"\d+", lambda m: _num_to_words(int(m.group())), text)
    text = re.sub(r"[^a-z' ]+", " ", text)
    return re.sub(r"\s+", " ", text).strip()


def ctc_trellis(emission: jax.Array, tokens: jax.Array,
                blank_id: int = 0) -> jax.Array:
    """Trellis [T+1, N+1]: max-score alignment DP, scanned over time."""
    T = emission.shape[0]
    N = tokens.shape[0]
    row0 = jnp.concatenate([jnp.zeros((1,)), jnp.full((N,), NEG_INF)])

    def step(prev, em_t):
        stay = prev[1:] + em_t[blank_id]
        change = prev[:-1] + em_t[tokens]
        new = jnp.concatenate([jnp.zeros((1,)), jnp.maximum(stay, change)])
        return new, new

    _, rows = jax.lax.scan(step, row0, emission)
    return jnp.concatenate([row0[None], rows], axis=0)


@dataclasses.dataclass
class PathPoint:
    token_index: int
    time_index: int
    score: float


def backtrack(trellis: np.ndarray, emission: np.ndarray,
              tokens: Sequence[int], blank_id: int = 0
              ) -> Optional[List[PathPoint]]:
    """Host-side backtrack (reference ``images_nn.py:89-123`` semantics):
    returns None when alignment fails."""
    trellis = np.asarray(trellis)
    emission = np.asarray(emission)
    j = trellis.shape[1] - 1
    t_start = int(np.argmax(trellis[:, j]))
    path: List[PathPoint] = []
    for t in range(t_start, 0, -1):
        stayed = trellis[t - 1, j] + emission[t - 1, blank_id]
        changed = trellis[t - 1, j - 1] + emission[t - 1, tokens[j - 1]]
        prob = float(np.exp(
            emission[t - 1, tokens[j - 1] if changed > stayed else blank_id]))
        path.append(PathPoint(j - 1, t - 1, prob))
        if changed > stayed:
            j -= 1
            if j == 0:
                break
    else:
        return None
    return path[::-1]


@dataclasses.dataclass
class Segment:
    label: str
    start: int
    end: int
    score: float


def merge_repeats(path: List[PathPoint], transcript: str) -> List[Segment]:
    segments = []
    i1 = 0
    while i1 < len(path):
        i2 = i1
        while i2 < len(path) and path[i1].token_index == path[i2].token_index:
            i2 += 1
        score = sum(p.score for p in path[i1:i2]) / (i2 - i1)
        segments.append(Segment(transcript[path[i1].token_index],
                                path[i1].time_index,
                                path[i2 - 1].time_index + 1, score))
        i1 = i2
    return segments


def utterance_bounds(emission: np.ndarray, transcript: str,
                     char2id: Dict[str, int], num_samples: int,
                     sample_rate: int = 16000, blank_id: int = 0
                     ) -> Optional[Tuple[float, float]]:
    """Full pipeline → (start_sec, end_sec) of the spoken transcript
    (reference ``get_times``/``merge_repeats`` return contract,
    ``images_nn.py:125-134``)."""
    transcript = normalize_transcript(transcript).replace(" ", "|")
    tokens = [char2id[c] for c in transcript if c in char2id]
    if not tokens:
        return None
    trellis = np.asarray(ctc_trellis(jnp.asarray(emission),
                                     jnp.asarray(tokens), blank_id))
    path = backtrack(trellis, emission, tokens, blank_id)
    if path is None:
        return None
    segments = merge_repeats(path, transcript)
    ratio = num_samples / emission.shape[0]
    return (segments[0].start * ratio / sample_rate,
            segments[-1].end * ratio / sample_rate)
