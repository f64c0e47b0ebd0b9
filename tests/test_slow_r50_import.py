"""slow_r50 weight import: numeric parity of convert_slow_r50 against a
torch implementation of the pytorchvideo slow-pathway geometry (the
reference's torch.hub backbone, SingleModels/models/visual.py:152), plus
the MME_PRETRAINED loading path and the visual_nn pickle e2e."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402

from mme_tpu.models.hf_import import convert_slow_r50  # noqa: E402
from mme_tpu.models.video import SlowR50  # noqa: E402

STAGES = (1, 1, 1, 1)
TEMPORAL = (1, 1, 3, 3)
WIDTHS = (64, 128, 256, 512)


def make_state_dict(rng):
    def t(*shape):
        return torch.tensor(rng.randn(*shape).astype(np.float32) * 0.05)

    def bn(c, prefix, sd):
        sd[f"{prefix}.weight"] = t(c) + 1.0
        sd[f"{prefix}.bias"] = t(c)
        sd[f"{prefix}.running_mean"] = t(c)
        sd[f"{prefix}.running_var"] = torch.tensor(
            rng.rand(c).astype(np.float32) + 0.5)

    sd = {"blocks.0.conv.weight": t(64, 3, 1, 7, 7)}
    bn(64, "blocks.0.norm", sd)
    in_ch = 64
    for s, (blocks, w, tk) in enumerate(zip(STAGES, WIDTHS, TEMPORAL)):
        for b in range(blocks):
            pre = f"blocks.{s + 1}.res_blocks.{b}"
            cin = in_ch if b == 0 else w * 4
            sd[f"{pre}.branch2.conv_a.weight"] = t(w, cin, tk, 1, 1)
            bn(w, f"{pre}.branch2.norm_a", sd)
            sd[f"{pre}.branch2.conv_b.weight"] = t(w, w, 1, 3, 3)
            bn(w, f"{pre}.branch2.norm_b", sd)
            sd[f"{pre}.branch2.conv_c.weight"] = t(w * 4, w, 1, 1, 1)
            bn(w * 4, f"{pre}.branch2.norm_c", sd)
            if b == 0:
                sd[f"{pre}.branch1_conv.weight"] = t(w * 4, cin, 1, 1, 1)
                bn(w * 4, f"{pre}.branch1_norm", sd)
        in_ch = w * 4
    return sd


def torch_slow_pooled(sd, video_bthwc):
    """Eval-mode forward of the slow-pathway backbone → pooled [B, 2048]."""
    x = torch.tensor(video_bthwc).permute(0, 4, 1, 2, 3)  # B,C,T,H,W

    def bn(y, p):
        return F.batch_norm(y, sd[f"{p}.running_mean"],
                            sd[f"{p}.running_var"], sd[f"{p}.weight"],
                            sd[f"{p}.bias"], False, 0.9, 1e-5)

    x = F.conv3d(x, sd["blocks.0.conv.weight"], None, stride=(1, 2, 2),
                 padding=(0, 3, 3))
    x = F.relu(bn(x, "blocks.0.norm"))
    x = F.max_pool3d(x, (1, 3, 3), stride=(1, 2, 2), padding=(0, 1, 1))
    for s, (blocks, tk) in enumerate(zip(STAGES, TEMPORAL)):
        for b in range(blocks):
            pre = f"blocks.{s + 1}.res_blocks.{b}"
            stride = 2 if (s > 0 and b == 0) else 1
            res = x
            y = F.conv3d(x, sd[f"{pre}.branch2.conv_a.weight"], None,
                         padding=(tk // 2, 0, 0))
            y = F.relu(bn(y, f"{pre}.branch2.norm_a"))
            y = F.conv3d(y, sd[f"{pre}.branch2.conv_b.weight"], None,
                         stride=(1, stride, stride), padding=(0, 1, 1))
            y = F.relu(bn(y, f"{pre}.branch2.norm_b"))
            y = F.conv3d(y, sd[f"{pre}.branch2.conv_c.weight"], None)
            y = bn(y, f"{pre}.branch2.norm_c")
            if b == 0:
                res = F.conv3d(x, sd[f"{pre}.branch1_conv.weight"], None,
                               stride=(1, stride, stride))
                res = bn(res, f"{pre}.branch1_norm")
            x = F.relu(y + res)
    return x.mean(dim=(2, 3, 4)).numpy()


def test_convert_slow_r50_parity():
    rng = np.random.RandomState(0)
    sd = make_state_dict(rng)
    video = rng.randn(2, 4, 32, 32, 3).astype(np.float32)

    with torch.no_grad():
        want = torch_slow_pooled(sd, video)

    model = SlowR50(output_dim=5, stage_sizes=STAGES)
    variables = model.init(jax.random.PRNGKey(0), video, train=False)
    conv = convert_slow_r50(sd, STAGES)
    # converted tree must cover the whole backbone (proj/classifier aside)
    params = dict(variables["params"])
    for k, v in conv["params"].items():
        assert k in params, k
        params[k] = jax.tree_util.tree_map(np.asarray, v)
    got = model.apply({"params": params,
                       "batch_stats": conv["batch_stats"]},
                      video, train=False, features_only=True)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_load_slow_r50_from_root(tmp_path):
    rng = np.random.RandomState(1)
    sd = make_state_dict(rng)
    torch.save({"model_state": sd}, tmp_path / "SLOW_8x8_R50.pyth")

    from mme_tpu.models.pretrained import load_slow_r50

    video = rng.randn(1, 4, 32, 32, 3).astype(np.float32)
    model = SlowR50(output_dim=3, stage_sizes=STAGES)
    variables = model.init(jax.random.PRNGKey(0), video, train=False)
    params, stats, ok = load_slow_r50(variables["params"],
                                      variables["batch_stats"],
                                      str(tmp_path), STAGES)
    assert ok
    np.testing.assert_array_equal(
        params["stem_conv"]["kernel"],
        sd["blocks.0.conv.weight"].numpy().transpose(2, 3, 4, 1, 0))
    np.testing.assert_array_equal(
        stats["layer4_0"]["bn3"]["var"],
        sd["blocks.4.res_blocks.0.branch2.norm_c.running_var"].numpy())
    # proj/classifier untouched
    np.testing.assert_array_equal(params["proj"]["kernel"],
                                  variables["params"]["proj"]["kernel"])


def test_visual_nn_pickle_e2e(tmp_path, monkeypatch):
    """visual_nn trains from the reference pickle contract with raw video."""
    cv2 = pytest.importorskip("cv2")
    import pandas as pd

    vids = []
    for i in range(2):
        p = str(tmp_path / f"v{i}.mp4")
        vw = cv2.VideoWriter(p, cv2.VideoWriter_fourcc(*"mp4v"), 8.0,
                             (64, 48))
        for j in range(12):
            vw.write(np.full((48, 64, 3), min(20 * j + 60 * i, 255),
                             np.uint8))
        vw.release()
        vids.append(p)
    n = 12
    rng = np.random.RandomState(0)
    labels = rng.randint(0, 2, n)
    df = pd.DataFrame({
        "video_path": [vids[i % 2] for i in range(n)],
        "timings": [None] * n,
        "emotion": labels,
        "split": ["train"] * 8 + ["val"] * 2 + ["test"] * 2,
    })
    pkl = tmp_path / "vid.pkl"
    df.to_pickle(pkl)
    monkeypatch.setenv("MME_TINY", "1")
    from mme_tpu.cli import visual_nn
    summary = visual_nn.main(["--dataset", str(pkl), "-e", "1", "-b", "4",
                              "-y", "2", "-l", "1e-3", "-m", "Conv"])
    assert "test/acc" in summary
