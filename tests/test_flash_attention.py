"""Flash-attention wrapper tests (CPU: fallback path + param-tree compat).

The Pallas kernel itself requires a TPU; the on-chip A/B lives in
scripts/scaled_bench.py. These tests pin what must hold everywhere:
FlashSelfAttention's parameter tree is byte-compatible with
nn.MultiHeadDotProductAttention (checkpoints swap between impls) and its
fallback math matches flax attention exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn
import pytest

from vision_collision_detection_tpu.ops.flash_attention import (
    FlashSelfAttention,
    _largest_block,
    _padded_len,
    flash_supported,
)


class TestBlocks:
    def test_largest_block(self):
        assert _largest_block(512) == 512
        assert _largest_block(640) == 128
        assert _largest_block(1024) == 512
        assert _largest_block(576) is None  # 576 = 2^6 * 9: needs padding

    def test_padded_len(self):
        assert _padded_len(576) == 640
        assert _padded_len(512) == 512
        assert _padded_len(129) == 256

    def test_not_supported_on_cpu(self):
        assert not flash_supported(512)  # suite runs on CPU


class TestFallbackParity:
    def _mha_params(self, key, dim, heads, seq):
        x = jnp.zeros((2, seq, dim), jnp.float32)
        ref = nn.MultiHeadDotProductAttention(num_heads=heads,
                                              dtype=jnp.float32)
        return ref, ref.init(key, x, x)

    def test_param_tree_compatible(self):
        dim, heads, seq = 32, 4, 20
        key = jax.random.PRNGKey(0)
        ref, ref_vars = self._mha_params(key, dim, heads, seq)
        ours = FlashSelfAttention(num_heads=heads, dtype=jnp.float32)
        our_vars = ours.init(key, jnp.zeros((2, seq, dim), jnp.float32))
        ref_tree = jax.tree.map(lambda a: a.shape, ref_vars)
        our_tree = jax.tree.map(lambda a: a.shape, our_vars)
        assert ref_tree == our_tree

    def test_fallback_matches_flax_attention(self):
        dim, heads, seq = 32, 4, 20
        key = jax.random.PRNGKey(1)
        ref, ref_vars = self._mha_params(key, dim, heads, seq)
        x = jax.random.normal(jax.random.PRNGKey(2), (3, seq, dim))
        ours = FlashSelfAttention(num_heads=heads, dtype=jnp.float32)
        got = ours.apply(ref_vars, x)  # same tree: reuse flax params
        want = ref.apply(ref_vars, x, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, rtol=2e-5)


class TestViViTIntegration:
    def test_vivit_flash_config_builds_and_runs_on_cpu(self):
        import dataclasses

        from vision_collision_detection_tpu.config import ModelConfig
        from vision_collision_detection_tpu.models.vivit import build_vivit

        cfg = ModelConfig(backbone="vivit_tiny", num_classes=3,
                          patch_size=14, attention_impl="flash")
        model = build_vivit(cfg)
        x = jnp.zeros((1, 2, 28, 28, 3), jnp.float32)
        variables = model.init({"params": jax.random.PRNGKey(0)}, x)
        logits = model.apply(variables, x)
        assert logits.shape == (1, 3)

        # checkpoints swap freely: xla-built params apply under flash cfg
        xla_model = build_vivit(dataclasses.replace(cfg, attention_impl="xla"))
        xla_vars = xla_model.init({"params": jax.random.PRNGKey(0)}, x)
        assert (jax.tree.map(lambda a: a.shape, xla_vars)
                == jax.tree.map(lambda a: a.shape, variables))
        # bf16 model: the fallback softmax runs in fp32 (matching the flash
        # kernel's numerics) while flax's runs in bf16, so outputs agree to
        # bf16 resolution, not exactly.
        out = model.apply(xla_vars, x)
        np.testing.assert_allclose(np.asarray(out),
                                   np.asarray(xla_model.apply(xla_vars, x)),
                                   atol=5e-2, rtol=2e-2)

    def test_flash_with_dropout_rejected(self):
        from vision_collision_detection_tpu.models.vivit import (
            TransformerBlock,
        )

        blk = TransformerBlock(dim=32, num_heads=4, dropout=0.1,
                               attention_impl="flash")
        with pytest.raises(ValueError, match="dropout"):
            blk.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
                     jnp.zeros((1, 8, 32)), True)
