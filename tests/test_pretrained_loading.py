"""Full-size pretrained-checkpoint loading round-trips (no network).

Round-1 gap: converters in hf_import.py were only exercised on tiny random
configs, so shape bugs specific to the REAL checkpoint geometries
(distilroberta's 6 layers, wav2vec2-large's 24 stable-LN layers, real
vocab/position sizes) were never hit, and no CLI path ever called them.
Here we build full-size HF models from configs (random weights — the real
architecture without the real bytes), save them the way a local checkpoint
directory looks, and load them through models/pretrained.py into the exact
param trees the CLIs initialize.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import transformers  # noqa: E402

from mme_tpu.models.audio import Wav2Vec2Classifier, Wav2Vec2Spec
from mme_tpu.models.fusion import TAVModel, TAVSpec
from mme_tpu.models.text import BertClassifier, TextEncoderSpec
from mme_tpu.models.pretrained import (AUDIO_XLSR, TEXT_EMOTION, VIDEO_MAE,
                                       find_checkpoint_dir,
                                       load_audio_classifier,
                                       load_local_state_dict,
                                       load_tav, load_text_classifier,
                                       merge_params, strip_model_prefix)


def _save(tmp_path, repo_id, model):
    d = tmp_path / repo_id.split("/")[-1]
    d.mkdir(parents=True, exist_ok=True)
    torch.save(model.state_dict(), d / "pytorch_model.bin")
    return str(d)


@pytest.fixture(scope="module")
def pretrained_dir(tmp_path_factory):
    """A local checkpoint root with all three full-size TAV towers."""
    tmp_path = tmp_path_factory.mktemp("pretrained")
    torch.manual_seed(0)
    # distilroberta geometry (j-hartmann/emotion-english-distilroberta-base):
    # 6 layers, 768 hidden, vocab 50265 — saved as a classifier so the
    # state_dict carries the 'roberta.' prefix like the real checkpoint
    tcfg = transformers.RobertaConfig(
        vocab_size=50265, max_position_embeddings=514, num_hidden_layers=6,
        hidden_size=768, num_attention_heads=12, intermediate_size=3072,
        type_vocab_size=1, pad_token_id=1, num_labels=7)
    _save(tmp_path, TEXT_EMOTION,
          transformers.RobertaForSequenceClassification(tcfg))
    # wav2vec2-large-xlsr geometry: 24 layers, 1024 hidden, stable LN,
    # conv bias, layer-norm feature extractor
    acfg = transformers.Wav2Vec2Config(
        hidden_size=1024, num_hidden_layers=24, num_attention_heads=16,
        intermediate_size=4096, conv_bias=True, feat_extract_norm="layer",
        do_stable_layer_norm=True)
    _save(tmp_path, AUDIO_XLSR, transformers.Wav2Vec2Model(acfg))
    # videomae-base-kinetics geometry: 12 layers, 768 hidden
    vcfg = transformers.VideoMAEConfig()
    _save(tmp_path, VIDEO_MAE, transformers.VideoMAEModel(vcfg))
    return str(tmp_path)


def test_text_classifier_full_size_roundtrip(pretrained_dir):
    spec = TextEncoderSpec.distilroberta()
    model = BertClassifier(spec, output_dim=7)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.ones((1, 8), jnp.int32),
                        jnp.ones((1, 8), jnp.int32))["params"]
    loaded, ok = load_text_classifier(params, spec, pretrained_dir)
    assert ok
    # a real leaf actually changed to the checkpoint values
    d = find_checkpoint_dir(pretrained_dir, TEXT_EMOTION)
    sd = strip_model_prefix(load_local_state_dict(d))
    np.testing.assert_allclose(
        np.asarray(loaded["bert"]["embeddings"]["word"]["embedding"]),
        sd["embeddings.word_embeddings.weight"], rtol=1e-6)
    # classifier head stays fresh
    np.testing.assert_array_equal(
        np.asarray(loaded["classifier"]["kernel"]),
        np.asarray(params["classifier"]["kernel"]))
    # forward runs at full size
    logits = model.apply({"params": loaded}, jnp.ones((1, 8), jnp.int32),
                         jnp.ones((1, 8), jnp.int32))
    assert logits.shape == (1, 7)
    assert np.isfinite(np.asarray(logits)).all()


def test_audio_classifier_full_size_roundtrip(pretrained_dir):
    spec = Wav2Vec2Spec.large()
    model = Wav2Vec2Classifier(spec, output_dim=7)
    wav = jnp.zeros((1, 4000), jnp.float32)
    mask = jnp.ones((1, 4000), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), wav, mask)["params"]
    loaded, ok = load_audio_classifier(params, spec, pretrained_dir,
                                       repo_id=AUDIO_XLSR)
    assert ok
    d = find_checkpoint_dir(pretrained_dir, AUDIO_XLSR)
    sd = strip_model_prefix(load_local_state_dict(d))
    np.testing.assert_allclose(
        np.asarray(loaded["wav2vec2"]["feature_projection"]["projection"]
                   ["kernel"]),
        sd["feature_projection.projection.weight"].T, rtol=1e-6)
    logits = model.apply({"params": loaded}, wav, mask)
    assert logits.shape == (1, 7)
    assert np.isfinite(np.asarray(logits)).all()


def test_tav_full_size_roundtrip_shapes(pretrained_dir):
    """All three towers into the flagship full-size TAV tree — via
    jax.eval_shape so the 0.6B-param forward never runs on the test CPU."""
    spec = TAVSpec(output_dim=7)
    model = TAVModel(spec)
    from mme_tpu.train.build_tav import example_tav_batch
    batch = example_tav_batch(spec, 1, 70, 16000)
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), batch))["params"]
    loaded, names = load_tav(shapes, spec, pretrained_dir)
    assert set(names) == {TEXT_EMOTION, AUDIO_XLSR, VIDEO_MAE}
    # spot-check: the text tower leaves became real arrays with real values
    w = loaded["model"]["text_encoder"]["embeddings"]["word"]["embedding"]
    assert isinstance(w, np.ndarray) and w.shape == (50265, 768)
    pe = loaded["preformer"]["video"]["patch_embed"]["proj"]["kernel"]
    assert isinstance(pe, np.ndarray) and pe.shape == (2 * 16 * 16 * 3, 768)
    me = loaded["preformer"]["masked_spec_embed"]
    assert isinstance(me, np.ndarray) and me.shape == (1024,)
    # fusion trunk stays untouched (still shape-structs, i.e. random init)
    fused = loaded["model"]["fusion_encoder"]
    leaves = jax.tree.leaves(fused)
    assert all(not isinstance(x, np.ndarray) for x in leaves)


def test_tav_full_size_roundtrip_shared_frontend(pretrained_dir):
    """Same, with TAVSpec.share_audio_frontend: the single conv stack at
    the model root receives the checkpoint's feature extractor."""
    import dataclasses as dc
    spec = dc.replace(TAVSpec(output_dim=7), share_audio_frontend=True)
    model = TAVModel(spec)
    from mme_tpu.train.build_tav import example_tav_batch
    batch = example_tav_batch(spec, 1, 70, 16000)
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), batch))["params"]
    assert "audio_frontend" in shapes
    assert "feature_extractor" not in shapes["preformer"]
    loaded, names = load_tav(shapes, spec, pretrained_dir)
    assert AUDIO_XLSR in names
    k = loaded["audio_frontend"]["conv_0"]["kernel"]
    assert isinstance(k, np.ndarray) and k.shape[-1] == 512


def test_merge_params_rejects_shape_mismatch():
    with pytest.raises(ValueError, match="shape mismatch"):
        merge_params({"a": np.zeros((2, 2))}, {"a": np.zeros((3, 2))})


def test_strip_model_prefix():
    sd = {"roberta.embeddings.word_embeddings.weight": np.zeros((4, 4)),
          "classifier.weight": np.zeros((2, 4))}
    out = strip_model_prefix(sd)
    assert "embeddings.word_embeddings.weight" in out
    assert "classifier.weight" not in out  # head of the classifier dropped


def test_glove_reaches_lstm_embedding(tmp_path):
    """GloVe vectors flow through data/glove.py into LSTMClassifier."""
    from mme_tpu.data.glove import (load_glove_txt, set_embedding_table,
                                    tokenize_with_vocab)
    from mme_tpu.models.text import LSTMClassifier
    rng = np.random.RandomState(0)
    path = tmp_path / "glove.txt"
    words = [f"word{i}" for i in range(30)]
    with open(path, "w") as f:
        for w in words:
            vec = " ".join(f"{x:.4f}" for x in rng.randn(16))
            f.write(f"{w} {vec}\n")
    vocab, table = load_glove_txt(str(path))
    assert table.shape == (32, 16)  # 30 words + pad + unk
    model = LSTMClassifier(vocab_size=32, embed_dim=16, output_dim=3)
    ids = tokenize_with_vocab(["word0 word5 missing"], vocab, 6)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(ids))["params"]
    params = set_embedding_table(params, table)
    np.testing.assert_allclose(
        np.asarray(params["embedding"]["embedding"]), table)
    out = model.apply({"params": params}, jnp.asarray(ids))
    assert out.shape == (1, 3)
