from mme_tpu.ops.attention import dot_product_attention, additive_mask
