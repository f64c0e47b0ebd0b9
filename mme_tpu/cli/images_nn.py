"""Image classifier entry point (reference ``SingleModels/images_nn.py``
``main()``): ``-m ResNet`` → ResNet-50 with fresh fc (frozen backbone);
anything else → the scratch ConvNet. Hateful-Memes binary task by default
(``-y 2``). (The reference file's repurposed ``__main__`` — CTC forced
alignment — lives in data/alignment.py.)"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mme_tpu.core.config import arg_parse, config_from_args
from mme_tpu.cli.common import run_classifier
from mme_tpu.data.synthetic import synthetic_image_dataset
from mme_tpu.models.image import ConvNetClassifier, ResnetClassifier


def main(argv=None):
    args = arg_parse("images_nn", argv)
    cfg = config_from_args(args)
    if cfg.output_dim == 7 and "hateful" in cfg.dataset.lower():
        cfg = cfg.replace(output_dim=2)
    np.random.seed(cfg.seed)

    size = 32 if cfg.dataset == "synthetic" else 224
    if cfg.model.lower() == "resnet":
        model = ResnetClassifier(output_dim=cfg.output_dim)
        has_bn = True
    else:
        # scratch ConvNet: the reference's binary sigmoid head ([B]) maps to
        # 2-class logits for the shared CE/metrics path; >2 classes emit
        # per-class sigmoid scores directly
        conv_out = 1 if cfg.output_dim == 2 else cfg.output_dim
        model = ConvNetClassifier(hidden_dims=tuple(cfg.hidden_layer_dims),
                                  output_dim=conv_out)
        has_bn = False

    def apply_fn(variables, batch, deterministic=True, rngs=None,
                 mutable=None):
        if has_bn:
            kw = {"mutable": mutable} if mutable else {}
            return model.apply(variables, batch["image"],
                               train=not deterministic, rngs=rngs, **kw)
        out = model.apply(variables, batch["image"], rngs=rngs)
        if out.ndim == 1:  # sigmoid scalar → 2-class logits
            out = jnp.stack([1.0 - out, out], axis=-1)
        return out

    n_train = 64 if cfg.dataset == "synthetic" else 6750
    mk = lambda n, s: synthetic_image_dataset(n, size=size,
                                              num_classes=cfg.output_dim,
                                              seed=s)
    train_ds, val_ds, test_ds = mk(n_train, 0), mk(16, 1), mk(16, 2)

    example = jnp.asarray(train_ds.features["image"][:1])
    if has_bn:
        variables = model.init(jax.random.PRNGKey(cfg.seed), example,
                               train=False)
        params, batch_stats = variables["params"], variables["batch_stats"]
        # frozen backbone (reference SingleModels/models/image.py:36-37):
        # only the new fc trains
        trainable = jax.tree_util.tree_map_with_path(
            lambda path, _: any(
                getattr(k, "key", None) == "fc" for k in path), params)
    else:
        params = model.init(jax.random.PRNGKey(cfg.seed), example)["params"]
        batch_stats, trainable = None, None
    return run_classifier(cfg, apply_fn, params, train_ds, val_ds, test_ds,
                          batch_stats=batch_stats, trainable_mask=trainable)


if __name__ == "__main__":
    main()
