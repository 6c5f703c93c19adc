"""128K-token full-model program construction (VERDICT r3 #7).

The on-chip measurement lives in `exps/longcontext_forward.py`; this test
pins the part that is checkable without a TPU: the COMPLETE flagship
NextDiT-2B forward traces and lowers at S = 131072 image tokens (8192x4096 px
latent grid) + 256 caption tokens. Tracing runs every shape rule in the model
(patchify, the 512x256 RoPE grid, scanned blocks, unpatchify) at the claimed
context length — a wrong RoPE grid reshape, an int32 index overflow guard, or
a block-size mismatch all fail here, not on the chip.

Reference scale claim: `/root/reference/README.md` ("128K tokens").
"""

import jax
import jax.numpy as jnp
import pytest

from lumina_t2x_tpu.models import get_model

pytestmark = pytest.mark.slow  # ~1 min trace/lower of the full 2B graph


class TestLongContext128K:
    TOKENS = 131072
    GH, GW = 512, 256  # gh*gw == TOKENS

    def test_2b_forward_lowers_at_128k_tokens(self):
        model = get_model(
            "NextDiT_2B_patch2", cap_feat_dim=2048, qk_norm=True,
            dtype=jnp.bfloat16, param_dtype=jnp.bfloat16, attn_impl="xla")
        p = model.patch_size
        h, w = self.GH * p, self.GW * p

        x = jax.ShapeDtypeStruct((1, model.in_channels, h, w), jnp.float32)
        t = jax.ShapeDtypeStruct((1,), jnp.float32)
        cap = jax.ShapeDtypeStruct((1, 256, 2048), jnp.float32)
        mask = jax.ShapeDtypeStruct((1, 256), jnp.int32)

        variables = jax.eval_shape(
            lambda r: model.init({"params": r, "label_dropout": r},
                                 jnp.zeros((1, model.in_channels, 2 * p, 2 * p),
                                           jnp.float32),
                                 jnp.zeros((1,), jnp.float32),
                                 jnp.zeros((1, 256, 2048), jnp.float32),
                                 jnp.ones((1, 256), jnp.int32)),
            jax.random.PRNGKey(0))

        def fwd(v, x, t, cap, mask):
            return model.apply(v, x, t, cap, mask)

        # eval_shape runs the full tracer at the 128K geometry
        out = jax.eval_shape(fwd, variables, x, t, cap, mask)
        assert out.shape == (1, model.in_channels, h, w)

        # and the program lowers to StableHLO (scan_blocks keeps it compact)
        lowered = jax.jit(fwd).lower(variables, x, t, cap, mask)
        assert "stablehlo" in lowered.as_text()[:4096].lower()
