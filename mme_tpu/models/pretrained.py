"""Pretrained-weight loading from LOCAL HF checkpoints into CLI runs.

The reference's entire modeling premise is pretrained towers
(``/root/reference/models/tav.py:257-263`` loads DistilRoBERTa-emotion,
wav2vec2-lg-xlsr and VideoMAE-kinetics; ``SingleModels/models/audio.py:46``;
``SingleModels/models/text.py:22`` GloVe). This module is the missing link
between the tested converters in ``hf_import.py`` and actual training runs:
given a directory of locally cached HF checkpoints (no network egress —
``MME_PRETRAINED`` env or ``--pretrained`` style config), it loads torch
state_dicts (safetensors or ``pytorch_model.bin``), converts them, and
injects them into the flax param trees the CLIs initialize.

Layout expected under the root directory, per checkpoint, either the full
repo id or its basename:

    $MME_PRETRAINED/j-hartmann/emotion-english-distilroberta-base/...
    $MME_PRETRAINED/emotion-english-distilroberta-base/model.safetensors
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Mapping, Optional, Sequence, Tuple

import numpy as np

from mme_tpu.models.hf_import import (convert_text_encoder, convert_videomae,
                                      convert_wav2vec2, state_dict_np)

ENV_VAR = "MME_PRETRAINED"

# reference checkpoint matrix (SURVEY.md §2.7)
TEXT_EMOTION = "j-hartmann/emotion-english-distilroberta-base"
AUDIO_XLSR = "ehcalabres/wav2vec2-lg-xlsr-en-speech-emotion-recognition"
AUDIO_SUPERB = "superb/wav2vec2-base-superb-er"
VIDEO_MAE = "MCG-NJU/videomae-base-finetuned-kinetics"


def pretrained_root(explicit: Optional[str] = None) -> Optional[str]:
    root = explicit or os.environ.get(ENV_VAR)
    return root if root and os.path.isdir(root) else None


def find_checkpoint_dir(root: str, repo_id: str) -> Optional[str]:
    """Locate ``repo_id`` under ``root`` (full id or basename)."""
    for cand in (repo_id, repo_id.split("/")[-1]):
        d = os.path.join(root, cand)
        if os.path.isdir(d):
            return d
    return None


def load_local_state_dict(ckpt_dir: str) -> Dict[str, np.ndarray]:
    """Read a checkpoint directory (or a direct file path) into numpy."""
    if os.path.isfile(ckpt_dir):
        candidates = [ckpt_dir]
    else:
        candidates = [os.path.join(ckpt_dir, n)
                      for n in ("model.safetensors", "pytorch_model.bin")]
        candidates = [c for c in candidates if os.path.exists(c)]
        if not candidates:
            raise FileNotFoundError(
                f"no model.safetensors/pytorch_model.bin in {ckpt_dir}")
    path = candidates[0]
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file
        return {k: np.asarray(v) for k, v in load_file(path).items()}
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    return state_dict_np(sd)


_TOWER_PREFIXES = ("roberta.", "bert.", "wav2vec2.", "videomae.",
                   "distilbert.", "model.")


def strip_model_prefix(sd: Mapping[str, np.ndarray],
                       probe: str = "embeddings") -> Dict[str, np.ndarray]:
    """Classifier checkpoints nest the base model under e.g. ``roberta.``;
    converters expect base-model keys. Auto-detect and strip one prefix."""
    if any(k.startswith(probe) or k.startswith("feature_extractor")
           or k.startswith("feature_projection") for k in sd):
        return dict(sd)
    for p in _TOWER_PREFIXES:
        if any(k.startswith(p) for k in sd):
            return {k[len(p):]: v for k, v in sd.items() if k.startswith(p)}
    return dict(sd)


def merge_params(target: Any, source: Any, _path: str = ""
                 ) -> Tuple[Any, List[str], List[str]]:
    """Recursively replace ``target`` leaves with same-path ``source``
    leaves (shape-checked). Returns (merged, missing, extra):
    ``missing`` = target leaf paths absent from source (left at init),
    ``extra`` = source leaf paths absent from target (ignored)."""
    if not isinstance(target, (dict,)):
        src = np.asarray(source)
        # tolerate jax.eval_shape ShapeDtypeStruct leaves (shape-only trees)
        tgt_shape = tuple(getattr(target, "shape", np.shape(target)))
        tgt_dtype = np.dtype(getattr(target, "dtype",
                                     np.asarray(target).dtype
                                     if not hasattr(target, "shape")
                                     else target.dtype))
        if tuple(src.shape) != tgt_shape:
            raise ValueError(
                f"shape mismatch at {_path}: checkpoint {src.shape} vs "
                f"model {tgt_shape}")
        return src.astype(tgt_dtype, copy=False), [], []
    merged: Dict[str, Any] = {}
    missing: List[str] = []
    extra: List[str] = [f"{_path}/{k}" for k in source
                        if k not in target] if isinstance(source, dict) else []
    for k, v in target.items():
        if isinstance(source, dict) and k in source:
            m, mi, ex = merge_params(v, source[k], f"{_path}/{k}")
            merged[k] = m
            missing += mi
            extra += ex
        else:
            merged[k] = v
            missing += _leaf_paths(v, f"{_path}/{k}")
    return merged, missing, extra


def _leaf_paths(tree: Any, path: str) -> List[str]:
    if not isinstance(tree, dict):
        return [path]
    out: List[str] = []
    for k, v in tree.items():
        out += _leaf_paths(v, f"{path}/{k}")
    return out


def _replace(params: Dict[str, Any], keys: Sequence[str],
             subtree: Any) -> Dict[str, Any]:
    """Copy-on-write replacement of ``params[keys[0]][keys[1]]...``."""
    out = dict(params)
    node = out
    for k in keys[:-1]:
        node[k] = dict(node[k])
        node = node[k]
    node[keys[-1]] = subtree
    return out


def _inject(params: Dict[str, Any], keys: Sequence[str], converted: Any,
            allow_missing: Sequence[str] = (), what: str = "") -> Dict[str, Any]:
    node = params
    for k in keys:
        node = node[k]
    merged, missing, _extra = merge_params(node, converted)
    bad = [m for m in missing
           if not any(a in m for a in allow_missing)]
    if bad:
        raise ValueError(
            f"pretrained load of {what or '/'.join(keys)} left model leaves "
            f"uninitialized: {bad[:8]}{'...' if len(bad) > 8 else ''}")
    return _replace(params, keys, merged)


def load_text_classifier(params: Dict[str, Any], spec: Any, root: str,
                         repo_id: str = TEXT_EMOTION,
                         tower_key: str = "bert") -> Tuple[Dict[str, Any], bool]:
    """BertClassifier: fill the ``bert`` tower from a local checkpoint
    (classifier head stays fresh, as in the reference)."""
    d = find_checkpoint_dir(root, repo_id)
    if d is None:
        return params, False
    sd = strip_model_prefix(load_local_state_dict(d))
    conv = convert_text_encoder(sd, spec)
    # classifier checkpoints (j-hartmann) drop the pooler; ours is fresh then
    allow = () if "pooler" in conv else ("pooler",)
    return _inject(params, (tower_key,), conv, allow, repo_id), True


def load_audio_classifier(params: Dict[str, Any], spec: Any, root: str,
                          repo_id: str = AUDIO_SUPERB,
                          tower_key: str = "wav2vec2"
                          ) -> Tuple[Dict[str, Any], bool]:
    d = find_checkpoint_dir(root, repo_id)
    if d is None:
        return params, False
    sd = strip_model_prefix(load_local_state_dict(d))
    conv = convert_wav2vec2(sd, spec)
    return _inject(params, (tower_key,), conv, (), repo_id), True


def load_tav(params: Dict[str, Any], spec: Any, root: str
             ) -> Tuple[Dict[str, Any], List[str]]:
    """TAVModel: fill all three pretrained towers AND the PreFormer
    embedding stages that reuse their weights (reference
    ``models/tav.py:257-263,344-368``). The fusion trunk, modality
    embedding, wav→hidden projection and classifier stay randomly
    initialized — the reference randomizes its fusion encoder anyway
    (``models/tav.py:441-442,461-471``)."""
    loaded: List[str] = []

    d = find_checkpoint_dir(root, TEXT_EMOTION)
    if d is not None:
        sd = strip_model_prefix(load_local_state_dict(d))
        conv = convert_text_encoder(sd, spec.text)
        allow = () if "pooler" in conv else ("pooler",)
        params = _inject(params, ("model", "text_encoder"), conv, allow,
                         TEXT_EMOTION)
        params = _inject(params, ("preformer", "text_embeddings"),
                         conv["embeddings"], (), TEXT_EMOTION)
        loaded.append(TEXT_EMOTION)

    d = find_checkpoint_dir(root, AUDIO_XLSR)
    if d is not None:
        sd = strip_model_prefix(load_local_state_dict(d))
        conv = convert_wav2vec2(sd, spec.audio)
        params = _inject(params, ("model", "wav2vec2"), conv, (), AUDIO_XLSR)
        # PreFormer audio embedding stage reuses the same tower's pieces
        # (models/tav.py:352-363: feature_extractor, feature_projection,
        # pos_conv_embed, encoder.layer_norm, masked_spec_embed); with
        # TAVSpec.share_audio_frontend the conv stack lives once at the
        # model root instead of per tower
        if "audio_frontend" in params:
            params = _inject(params, ("audio_frontend",),
                             conv["feature_extractor"], (), AUDIO_XLSR)
        if "feature_extractor" in params.get("preformer", {}):
            params = _inject(params, ("preformer", "feature_extractor"),
                             conv["feature_extractor"], (), AUDIO_XLSR)
        params = _inject(params, ("preformer", "feature_projection"),
                         conv["feature_projection"], (), AUDIO_XLSR)
        params = _inject(params, ("preformer", "pos_conv"),
                         conv["encoder"]["pos_conv"], (), AUDIO_XLSR)
        enc_ln = (conv["encoder"]["layers"].get("final_ln")
                  or conv["encoder"].get("ln"))
        if enc_ln is not None:
            params = _inject(params, ("preformer", "audio_ln"), enc_ln, (),
                             AUDIO_XLSR)
        params = _replace(params, ("preformer", "masked_spec_embed"),
                          np.asarray(conv["masked_spec_embed"]))
        loaded.append(AUDIO_XLSR)

    d = find_checkpoint_dir(root, VIDEO_MAE)
    if d is not None:
        sd = strip_model_prefix(load_local_state_dict(d))
        conv = convert_videomae(sd, spec.video)
        params = _inject(params, ("model", "videomae"), conv, (), VIDEO_MAE)
        # PreFormer's video module only materializes the embedding stage
        params = _inject(params, ("preformer", "video"),
                         {"patch_embed": conv["patch_embed"]}, (), VIDEO_MAE)
        loaded.append(VIDEO_MAE)

    return params, loaded


SLOW_R50 = "slow_r50"


def load_slow_r50(params: Dict[str, Any], batch_stats: Dict[str, Any],
                  root: str, stage_sizes: Sequence[int] = (3, 4, 6, 3)
                  ) -> Tuple[Dict[str, Any], Dict[str, Any], bool]:
    """SlowR50 backbone weights from a local torch.hub/pytorchvideo
    checkpoint (the reference loads ``torch.hub 'slow_r50'`` at
    ``SingleModels/models/visual.py:152``). Accepts ``slow_r50.pt[h]`` /
    ``SLOW_8x8_R50.pyth`` files or a ``slow_r50/`` directory under
    ``root``; proj head + classifier stay fresh (the reference replaces
    the head too)."""
    import glob as globlib

    from mme_tpu.models.hf_import import convert_slow_r50

    cands: List[str] = []
    for name in (SLOW_R50, "SLOW_8x8_R50"):
        cands += [os.path.join(root, name + ext)
                  for ext in (".pt", ".pth", ".pyth", ".bin")]
        d = os.path.join(root, name)
        if os.path.isdir(d):
            cands += sorted(globlib.glob(os.path.join(d, "*.p*")))
    path = next((c for c in cands if os.path.isfile(c)), None)
    if path is None:
        return params, batch_stats, False
    import torch
    raw = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(raw, dict) and "model_state" in raw:
        raw = raw["model_state"]
    conv = convert_slow_r50(raw, stage_sizes)
    merged_p, missing, _ = merge_params(params, conv["params"])
    bad = [m for m in missing if "proj" not in m and "classifier" not in m]
    if bad:
        raise ValueError(f"slow_r50 load left leaves uninitialized: "
                         f"{bad[:8]}")
    merged_s, missing_s, _ = merge_params(batch_stats, conv["batch_stats"])
    if missing_s:
        raise ValueError(f"slow_r50 load left batch stats uninitialized: "
                         f"{missing_s[:8]}")
    return merged_p, merged_s, True
