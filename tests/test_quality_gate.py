"""The quality gate: weighted-F1 parity between a reference-faithful
PyTorch training run and the mme_tpu loop on the same data.

BASELINE.md's contract ("weighted-F1 parity with the reference") could not
be checked against upstream numbers — the reference publishes none — so
this test builds the comparison point itself: a PyTorch trainer replicating
the reference's policy stack (``train_model/tav_train.py:147-160`` AdamW +
CosineAnnealingWarmRestarts + clip; ``utils/global_functions.py:21-83``
epoch-parity sampler/loss; best-save + epoch reload) trains the SAME
weight-initialized model on the SAME sample order as train_network, and the
final test weighted-F1 must agree.
"""

import copy

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")
sklearn_metrics = pytest.importorskip("sklearn.metrics")

from mme_tpu.core.config import ExperimentConfig
from mme_tpu.data.dataset import ArrayDataset, batches
from mme_tpu.evals.metrics import Metrics
from mme_tpu.models.hf_import import convert_text_encoder
from mme_tpu.models.layers import EncoderSpec
from mme_tpu.models.text import BertClassifier, TextEncoderSpec
from mme_tpu.train.loop import evaluate, train_network
from mme_tpu.train.losses import class_weights_from_counts
from mme_tpu.train.policies import epoch_order, sample_weights_from_labels
from mme_tpu.train.schedules import cosine_warm_restarts
from mme_tpu.train.steps import (TrainState, make_eval_step, make_optimizer,
                                 make_train_step)

VOCAB, SEQ, C = 97, 12, 3


def _data(n, seed):
    """Class-banded token data: label c draws most tokens from band c."""
    rng = np.random.RandomState(seed)
    labels = rng.randint(0, C, n)
    band = 2 + labels * 30  # bands [2,32), [32,62), [62,92)
    ids = band[:, None] + rng.randint(0, 30, (n, SEQ))
    noise = rng.rand(n, SEQ) < 0.2
    ids = np.where(noise, rng.randint(2, 92, (n, SEQ)), ids)
    mask = np.ones((n, SEQ), np.int64)
    return (ArrayDataset({"input_ids": ids.astype(np.int32),
                          "text_mask": mask.astype(np.int32)},
                         labels.astype(np.int64)),
            ids.astype(np.int64), mask, labels.astype(np.int64))


class TorchClassifier(torch.nn.Module):
    def __init__(self, hf, hidden, classes):
        super().__init__()
        self.bert = hf
        self.fc = torch.nn.Linear(hidden, classes)

    def forward(self, ids, mask):
        pooled = self.bert(input_ids=ids, attention_mask=mask).pooler_output
        return self.fc(pooled)


def _torch_reference_run(model, cfg, train, val, test, class_weights):
    """The reference trainer, compact: epoch-parity sampler+loss, AdamW,
    warm-restart cosine stepped per batch, grad clip, best-save on val loss
    at epoch end, best reload each epoch."""
    ids_tr, mask_tr, y_tr = train
    opt = torch.optim.AdamW(model.parameters(), lr=cfg.learning_rate,
                            betas=(0.9, 0.999), eps=1e-8,
                            weight_decay=cfg.weight_decay)
    sched = torch.optim.lr_scheduler.CosineAnnealingWarmRestarts(
        opt, T_0=cfg.T_max)
    w = torch.tensor(class_weights, dtype=torch.float32)
    host_rng = np.random.default_rng(cfg.seed)
    sw = np.asarray(class_weights)[y_tr]
    iters = int(np.ceil(len(y_tr) / cfg.batch_size))
    best_loss, best_state = float("inf"), None

    def val_loss():
        model.eval()
        with torch.no_grad():
            logits = model(torch.tensor(val[0]), torch.tensor(val[1]))
            # eval uses the epoch's parity weights in our loop too
            crit = (torch.nn.CrossEntropyLoss(weight=w)
                    if epoch % cfg.epoch_switch else
                    torch.nn.CrossEntropyLoss())
            return float(crit(logits, torch.tensor(val[2])))

    for epoch in range(cfg.epoch):
        order = epoch_order(host_rng, epoch, cfg.epoch_switch, sw, len(y_tr))
        crit = (torch.nn.CrossEntropyLoss(weight=w)
                if epoch % cfg.epoch_switch else torch.nn.CrossEntropyLoss())
        model.train()
        for b in range(iters):
            idx = order[b * cfg.batch_size:(b + 1) * cfg.batch_size]
            opt.zero_grad()
            logits = model(torch.tensor(ids_tr[idx]),
                           torch.tensor(mask_tr[idx]))
            loss = crit(logits, torch.tensor(y_tr[idx]))
            loss.backward()
            torch.nn.utils.clip_grad_norm_(model.parameters(), cfg.clip)
            opt.step()
            sched.step(epoch + (b + 1) / iters)
        vl = val_loss()
        if vl < best_loss:
            best_loss, best_state = vl, copy.deepcopy(model.state_dict())
        model.load_state_dict(best_state)  # best reload each epoch

    model.eval()
    with torch.no_grad():
        preds = model(torch.tensor(test[0]),
                      torch.tensor(test[1])).argmax(-1).numpy()
    return sklearn_metrics.f1_score(test[2], preds, average="weighted")


def test_weighted_f1_parity_with_torch_reference(tmp_path):
    spec = TextEncoderSpec(
        vocab_size=VOCAB, max_positions=40, type_vocab_size=1,
        pad_token_id=1, position_style="roberta",
        encoder=EncoderSpec(hidden=32, heads=4, layers=2, intermediate=64,
                            ln_style="post", ln_eps=1e-5, dropout=0.0))
    hf_cfg = transformers.RobertaConfig(
        vocab_size=VOCAB, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=40, type_vocab_size=1, pad_token_id=1,
        layer_norm_eps=1e-5, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0)
    torch.manual_seed(0)
    tmodel = TorchClassifier(transformers.RobertaModel(hf_cfg), 32, C)

    cfg = ExperimentConfig(epoch=6, batch_size=16, learning_rate=5e-3,
                           weight_decay=1e-4, clip=1.0, epoch_switch=2,
                           T_max=2, patience=1000, log_val=10000,
                           output_dim=C, dropout=0.0, seed=32,
                           checkpoint_dir=str(tmp_path / "ck"))

    train_ds, ids_tr, mask_tr, y_tr = _data(160, 0)
    val_ds, ids_va, mask_va, y_va = _data(48, 1)
    test_ds, ids_te, mask_te, y_te = _data(48, 2)
    counts = np.bincount(y_tr, minlength=C)
    cw = class_weights_from_counts(counts)

    # --- torch reference run ---
    f1_torch = _torch_reference_run(
        tmodel, cfg, (ids_tr, mask_tr, y_tr), (ids_va, mask_va, y_va),
        (ids_te, mask_te, y_te), cw)

    # --- mme_tpu run from the SAME initial weights ---
    model = BertClassifier(spec, output_dim=C, dropout=0.0)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.ones((1, SEQ), jnp.int32),
                        jnp.ones((1, SEQ), jnp.int32))["params"]
    torch.manual_seed(0)  # rebuild the exact torch init (tmodel has trained)
    tinit = TorchClassifier(transformers.RobertaModel(hf_cfg), 32, C)
    params = dict(params)
    params["bert"] = convert_text_encoder(tinit.bert, spec)
    params["classifier"] = {
        "kernel": tinit.fc.weight.detach().numpy().T,
        "bias": tinit.fc.bias.detach().numpy()}

    def apply_fn(variables, batch, deterministic=True, rngs=None,
                 mutable=None):
        return model.apply(variables, batch["input_ids"],
                           batch["text_mask"],
                           deterministic=deterministic, rngs=rngs)

    steps_per_epoch = int(np.ceil(len(train_ds) / cfg.batch_size))
    tx = make_optimizer(
        cosine_warm_restarts(cfg.learning_rate, cfg.T_max, steps_per_epoch),
        cfg.weight_decay, cfg.clip)
    state = TrainState.create(params, tx)
    train_step = make_train_step(apply_fn, tx, num_classes=C)
    eval_step = make_eval_step(apply_fn, num_classes=C)
    metric = Metrics(C, {i: str(i) for i in range(C)})
    sw = sample_weights_from_labels(y_tr, cw)
    state = train_network(train_step, eval_step, state, train_ds, val_ds,
                          cfg, metric, cw, sw, jax.random.PRNGKey(cfg.seed))
    summary = evaluate(eval_step, state, test_ds, cfg, metric)
    f1_ours = summary["test/weighted-f1-score"]

    # identical init + identical sample order + matched policies → the two
    # frameworks must land on the same quality (fp divergence only)
    assert f1_torch > 0.7, f"torch reference failed to learn: {f1_torch}"
    assert f1_ours > 0.7, f"mme_tpu failed to learn: {f1_ours}"
    assert abs(f1_torch - f1_ours) < 0.1, (f1_torch, f1_ours)
