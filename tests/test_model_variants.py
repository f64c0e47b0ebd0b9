"""Shape/grad smoke tests for the remaining model families (tiny configs)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mme_tpu.models.fusion import (FUSION_MODELS, TAVForMAETwoTower,
                                   TAVForW2V2, TAVSpec)
from mme_tpu.models.text_video import (BertVideoMAELateFusion,
                                       BertVideoMAEMTLShared, TextVideoSpec)
from mme_tpu.models.video import Conv3DClassifier, SlowR50
from mme_tpu.ops.video import balanced_keep_mask


@pytest.fixture(scope="module")
def tav_batch():
    spec = TAVSpec(output_dim=7).tiny()
    rng = np.random.RandomState(0)
    B, T = 2, 400
    return spec, {
        "input_ids": jnp.asarray(rng.randint(2, spec.text.vocab_size,
                                             size=(B, 12))),
        "text_mask": jnp.ones((B, 12), jnp.int32),
        "waveform": jnp.asarray(rng.randn(B, T).astype(np.float32)),
        "audio_mask": jnp.ones((B, T), jnp.int32),
        "video": jnp.asarray(rng.randn(B, spec.video.num_frames,
                                       spec.video.image_size,
                                       spec.video.image_size,
                                       3).astype(np.float32)),
        "video_keep": balanced_keep_mask(jax.random.PRNGKey(1), B,
                                         spec.video.num_patches,
                                         spec.video_keep_k),
    }


@pytest.mark.parametrize("name", ["TAVForMAE2Tower", "TAVForW2V2"])
def test_fusion_variants(tav_batch, name):
    spec, batch = tav_batch
    model = FUSION_MODELS[name](spec)
    params = model.init(jax.random.PRNGKey(0), batch)
    logits = model.apply(params, batch)
    assert logits.shape == (2, 7)
    assert np.isfinite(np.asarray(logits)).all()


def test_registry_covers_reference_model_flags():
    # the reference -m values (tav_nn.py default 'MAE_encoder' and the
    # multi+late class names) all resolve
    for flag in ["MAE_encoder", "TAVForMAE", "TAVFormer", "TAVForMAE2Tower",
                 "TAVForW2V2", "TAVMoE"]:
        assert flag in FUSION_MODELS


def test_tav_moe_variant_forward_and_aux(tav_batch):
    from mme_tpu.models.moe import collect_aux_loss
    spec, batch = tav_batch
    model = FUSION_MODELS["TAVMoE"](spec)
    params = model.init(jax.random.PRNGKey(0), batch)
    logits, inter = model.apply(params, batch, mutable=["intermediates"])
    assert logits.shape == (2, 7)
    assert np.isfinite(np.asarray(logits)).all()
    aux = collect_aux_loss(inter["intermediates"])
    assert float(aux) > 0  # router load-balancing loss was sown


def test_tav_moe_cli_smoke(tmp_path, monkeypatch):
    """-m TAVMoE trains end-to-end (synthetic, tiny) with the aux loss
    wired through the train step."""
    monkeypatch.setenv("MME_TINY", "1")
    monkeypatch.setenv("MME_RUN_DIR", str(tmp_path))
    monkeypatch.delenv("MME_EVAL_ONLY", raising=False)
    from mme_tpu.cli.tav_nn import main
    summary = main(["--dataset", "synthetic", "--model", "TAVMoE",
                    "--epoch", "1", "--batch_size", "8",
                    "--output_dim", "7"])
    assert np.isfinite(summary["test/loss"])


@pytest.fixture(scope="module")
def tv_setup():
    spec = TextVideoSpec(output_dim=5).tiny()
    rng = np.random.RandomState(1)
    B = 2
    ids = jnp.asarray(rng.randint(2, spec.text.vocab_size, size=(B, 10)))
    mask = jnp.ones((B, 10), jnp.int32)
    video = jnp.asarray(rng.randn(B, spec.video.num_frames,
                                  spec.video.image_size,
                                  spec.video.image_size,
                                  3).astype(np.float32))
    return spec, ids, mask, video


def test_mtl_shared_task_routing(tv_setup):
    spec, ids, mask, video = tv_setup
    model = BertVideoMAEMTLShared(spec)
    params = model.init(jax.random.PRNGKey(0), ids, mask, video,
                        jnp.asarray(0))
    out_text = model.apply(params, ids, mask, video, jnp.asarray(0))
    out_vid = model.apply(params, ids, mask, video, jnp.asarray(1))
    assert out_text.shape == out_vid.shape == (2, 5)
    # the two tasks route through different towers → different logits
    assert np.abs(np.asarray(out_text) - np.asarray(out_vid)).max() > 1e-4

    # the shared layer receives gradients from BOTH tasks
    for task in (0, 1):
        g = jax.grad(lambda p: (model.apply(
            p, ids, mask, video, jnp.asarray(task)) ** 2).sum())(params)
        shared = g["params"]["shared_layer"]["kernel"]
        assert float(jnp.abs(shared).sum()) > 0, f"task {task}"


def test_late_fusion(tv_setup):
    spec, ids, mask, video = tv_setup
    model = BertVideoMAELateFusion(spec)
    params = model.init(jax.random.PRNGKey(0), ids, mask, video)
    out = model.apply(params, ids, mask, video)
    assert out.shape == (2, 5)


def test_slow_r50_and_conv3d():
    rng = np.random.RandomState(2)
    video = jnp.asarray(rng.randn(2, 4, 32, 32, 3).astype(np.float32))
    m1 = SlowR50(output_dim=4, stage_sizes=(1, 1, 1, 1))
    v1 = m1.init(jax.random.PRNGKey(0), video, train=False)
    out1 = m1.apply(v1, video, train=False)
    assert out1.shape == (2, 4)
    m2 = Conv3DClassifier(output_dim=4)
    v2 = m2.init(jax.random.PRNGKey(0), video)
    out2 = m2.apply(v2, video)
    assert out2.shape == (2, 4)
