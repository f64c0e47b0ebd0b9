"""Measure the PyTorch reference TAV train-step rate on THIS host.

BASELINE.md needs a real denominator for bench.py's ``vs_baseline``: the
reference records no throughput anywhere, so we rebuild its TAV training
step faithfully in torch (the same compute graph as
``/root/reference/models/tav.py:344-504`` + ``train_model/tav_train.py:52-65``:
PreFormer embedding stages, four towers incl. the complement-masked VideoMAE
tower and the randomly-initialized 12-layer fusion encoder, CE loss,
backward, grad clip, AdamW step) at the same shapes bench.py uses (text 70,
audio 6 s @ 16 kHz, video 16x224x224, batch 1 — the reference's sweep batch
size), and time it.

Writes BASELINE_MEASURED.json at the repo root; bench.py picks it up as the
``vs_baseline`` denominator. Run once per host:

    python scripts/measure_torch_baseline.py [--steps 3]

Caveat recorded in the JSON: this host exposes no CUDA device, so the torch
rate is measured on CPU — a lower bound for the reference's V100. The V100
envelope estimate (~2 utt/s, BASELINE.md) is kept alongside.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np
import torch
import transformers
from transformers.models.videomae.modeling_videomae import VideoMAEEncoder


class ReferenceTAV(torch.nn.Module):
    """The reference's PreFormer+TAVForMAE compute graph, full size."""

    def __init__(self):
        super().__init__()
        tcfg = transformers.RobertaConfig(
            vocab_size=50265, max_position_embeddings=514,
            num_hidden_layers=6, hidden_size=768, num_attention_heads=12,
            intermediate_size=3072, type_vocab_size=1, pad_token_id=1)
        acfg = transformers.Wav2Vec2Config(
            hidden_size=1024, num_hidden_layers=24, num_attention_heads=16,
            intermediate_size=4096, conv_bias=True,
            feat_extract_norm="layer", do_stable_layer_norm=True)
        vcfg = transformers.VideoMAEConfig()
        self.bert = transformers.RobertaModel(tcfg)
        self.wav = transformers.Wav2Vec2Model(acfg)
        self.vid = transformers.VideoMAEModel(vcfg)
        self.wav_proj = torch.nn.Linear(1024, 768)          # tav.py:363,477
        self.fusion = VideoMAEEncoder(vcfg)                 # tav.py:441-442
        self.modality = torch.nn.Embedding(3, 768)          # tav.py:435
        self.norms = torch.nn.ModuleList(
            [torch.nn.LayerNorm(768) for _ in range(4)])
        self.classifier = torch.nn.Linear(4 * 768, 7)       # tav.py:451

    def forward(self, ids, tmask, wave, vmask_keep, video):
        # PreFormer embedding stages (tav.py:344-417)
        t_emb = self.bert.embeddings(input_ids=ids)
        feats = self.wav.feature_extractor(wave).transpose(1, 2)
        a_emb, _ = self.wav.feature_projection(feats)
        a_emb = self.wav_proj(a_emb)
        v_emb = self.vid.embeddings(video, ~vmask_keep)     # visible tokens
        fused = torch.cat([t_emb, a_emb, v_emb], dim=1)
        type_ids = torch.cat([
            torch.zeros(ids.shape, dtype=torch.long),
            torch.ones(a_emb.shape[:2], dtype=torch.long),
            torch.full(v_emb.shape[:2], 2, dtype=torch.long)], dim=1)
        fused = fused + self.modality(type_ids)
        # four towers (tav.py:473-504)
        av = self.fusion(fused).last_hidden_state.mean(1)
        txt = self.bert(input_ids=ids, attention_mask=tmask).pooler_output
        aud = self.wav_proj(self.wav(wave).last_hidden_state).mean(1)
        vid = self.vid(video, bool_masked_pos=vmask_keep
                       ).last_hidden_state.mean(1)          # complement
        tav = torch.cat([self.norms[0](av), self.norms[1](txt),
                         self.norms[2](aud), self.norms[3](vid)], dim=1)
        return self.classifier(tav)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--audio_len", type=int, default=96000)
    args = ap.parse_args()

    torch.manual_seed(0)
    model = ReferenceTAV()
    opt = torch.optim.AdamW(model.parameters(), lr=5e-6, weight_decay=1e-4)
    crit = torch.nn.CrossEntropyLoss()

    B = args.batch
    ids = torch.randint(0, 50265, (B, 70))
    tmask = torch.ones(B, 70, dtype=torch.long)
    wave = torch.randn(B, args.audio_len)
    video = torch.randn(B, 16, 3, 224, 224)
    # reference keeps ~104/1568 visible in the fused tower (tav.py:207-217)
    keep = torch.zeros(B, 1568, dtype=torch.bool)
    keep[:, ::15] = True
    labels = torch.zeros(B, dtype=torch.long)

    times = []
    for i in range(args.steps):
        t0 = time.perf_counter()
        opt.zero_grad()
        logits = model(ids, tmask, wave, keep, video)
        loss = crit(logits, labels)
        loss.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), 1.0)
        opt.step()
        dt = time.perf_counter() - t0
        times.append(dt)
        print(f"step {i}: {dt:.1f}s  loss={float(loss):.4f}", flush=True)

    best = min(times[1:]) if len(times) > 1 else times[0]
    out = {
        "torch_utt_per_sec": round(B / best, 4),
        "torch_sec_per_step": round(best, 2),
        "device": "cpu" if not torch.cuda.is_available() else
        torch.cuda.get_device_name(0),
        "torch_threads": torch.get_num_threads(),
        "batch": B,
        "shapes": {"text": 70, "audio": args.audio_len,
                   "video": [16, 224, 224]},
        "v100_envelope_utt_per_sec": 2.0,
        "note": ("reference-faithful TAV train step timed on this host; "
                 "no CUDA available so this is a same-host CPU lower bound "
                 "for the reference's V100 rate (envelope estimate kept "
                 "alongside)"),
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BASELINE_MEASURED.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
