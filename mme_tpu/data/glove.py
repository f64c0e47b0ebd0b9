"""GloVe embedding loading without torchtext.

The reference pulls GloVe through torchtext for its LSTM text classifier
(``utils/data_loaders.py:7-8``, ``SingleModels/models/text.py:22``). Here:
a plain-text ``.txt``/``.vec`` reader producing (vocab dict, [V, D] matrix)
plus an initializer that drops the vectors into ``LSTMClassifier``'s
embedding table. Works with any locally available GloVe release; with none,
the LSTM trains from random init.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

PAD, UNK = "<pad>", "<unk>"


def load_glove_txt(path: str, max_words: Optional[int] = None
                   ) -> Tuple[Dict[str, int], np.ndarray]:
    """Read 'word v1 v2 ...' lines → (word→id, [V, D] float32). Ids 0/1 are
    reserved for pad (zeros) and unk (mean vector)."""
    words: List[str] = []
    vecs: List[np.ndarray] = []
    with open(path, encoding="utf-8") as f:
        for line in f:
            parts = line.rstrip().split(" ")
            if len(parts) < 10:
                continue  # header line of .vec files
            words.append(parts[0])
            vecs.append(np.asarray(parts[1:], np.float32))
            if max_words and len(words) >= max_words:
                break
    mat = np.stack(vecs)
    vocab = {PAD: 0, UNK: 1}
    for w in words:
        vocab.setdefault(w, len(vocab))
    full = np.zeros((len(vocab), mat.shape[1]), np.float32)
    full[1] = mat.mean(axis=0)
    full[2:] = mat[: len(vocab) - 2]
    return vocab, full


def tokenize_with_vocab(texts: Sequence[str], vocab: Dict[str, int],
                        max_len: int) -> np.ndarray:
    """Whitespace tokenization against a GloVe vocab, padded/truncated."""
    out = np.zeros((len(texts), max_len), np.int32)
    unk = vocab[UNK]
    for i, t in enumerate(texts):
        ids = [vocab.get(w, unk) for w in str(t).lower().split()[:max_len]]
        out[i, :len(ids)] = ids
    return out


def set_embedding_table(params: dict, table: np.ndarray,
                        path: Sequence[str] = ("embedding", "embedding")
                        ) -> dict:
    """Return params with the embedding table replaced by GloVe vectors
    (shape-checked; vocab must match the model's vocab_size)."""
    node = params
    for k in path[:-1]:
        node = node[k]
    old = node[path[-1]]
    assert old.shape == table.shape, (old.shape, table.shape)
    node[path[-1]] = table
    return params
