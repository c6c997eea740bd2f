"""Native Flax DINOv2 vision encoder.

A TPU-first reimplementation of the DINOv2 ViT (the reference consumes it via
HuggingFace's FlaxDinov2Model, see /root/reference/hypervla/components/
base_vit.py:76-77 and hypervla/model.py:543-565). The parameter tree matches
HF's exactly (embeddings/encoder.layer.N/..., layernorm) so pretrained
checkpoints convert 1:1, but the forward pass is written for XLA/TPU:

  * static-shape position-embedding interpolation, traced once per resolution
  * a single attention path with optional attention-prob output
  * configurable compute dtype (bfloat16 recommended on TPU; params stay fp32)

Output mirrors the HF interface subset the reference uses:
`.last_hidden_state` and `.attentions`.
"""
import dataclasses
import math
from typing import Optional, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from hypervla_tpu.typing import Dtype


@dataclasses.dataclass(frozen=True)
class DINOv2Config:
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    mlp_ratio: int = 4
    patch_size: int = 14
    image_size: int = 518  # resolution the position grid was trained at
    num_channels: int = 3
    layerscale_value: float = 1.0
    layer_norm_eps: float = 1e-6
    use_mask_token: bool = True
    use_swiglu_ffn: bool = False
    initializer_range: float = 0.02
    hidden_dropout_prob: float = 0.0
    attention_probs_dropout_prob: float = 0.0


_NAMED_CONFIGS = {
    # facebook/dinov2-{small,base,large,giant}
    "dinov2-small": DINOv2Config(hidden_size=384, num_attention_heads=6),
    "dinov2-base": DINOv2Config(hidden_size=768, num_attention_heads=12),
    "dinov2-large": DINOv2Config(
        hidden_size=1024, num_hidden_layers=24, num_attention_heads=16
    ),
    "dinov2-giant": DINOv2Config(
        hidden_size=1536, num_hidden_layers=40, num_attention_heads=24,
        use_swiglu_ffn=True,
    ),
    # tiny model for CPU tests
    "dinov2-test": DINOv2Config(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        image_size=224,
    ),
    # smallest geometry the Pallas layer kernels accept (hidden % 128 == 0):
    # CPU interpret-mode integration tests of layers_impl="pallas_train"
    "dinov2-test-wide": DINOv2Config(
        hidden_size=128, num_hidden_layers=2, num_attention_heads=2,
        image_size=224,
    ),
}


def dinov2_config(name: str) -> DINOv2Config:
    key = name.split("/")[-1]
    if key not in _NAMED_CONFIGS:
        raise ValueError(f"unknown DINOv2 config {name}")
    return _NAMED_CONFIGS[key]


@dataclasses.dataclass
class DINOv2Output:
    last_hidden_state: jax.Array
    attentions: Optional[Tuple[jax.Array, ...]] = None


def _hf_init(initializer_range: float):
    return jax.nn.initializers.variance_scaling(
        initializer_range**2, "fan_in", "truncated_normal"
    )


class _PatchEmbeddings(nn.Module):
    config: DINOv2Config
    dtype: Dtype = jnp.float32
    # Patch embedding as space-to-depth + one GEMM instead of nn.Conv.
    # A stride-14 conv over 3 input channels is pathological on the MXU
    # (C_in pads 3 -> 128: profiled 24 ms of an 87 ms bs=32 train step,
    # <1% MFU); the same contraction as [B*patches, 14*14*3] @ [588, H]
    # keeps the reduction dim dense. Param layout stays nn.Conv-compatible
    # (projection/{kernel,bias}, kernel (kh, kw, cin, cout)).
    as_gemm: bool = True

    @nn.compact
    def __call__(self, pixel_values):
        c = self.config
        if not self.as_gemm:
            x = nn.Conv(
                c.hidden_size,
                kernel_size=(c.patch_size, c.patch_size),
                strides=(c.patch_size, c.patch_size),
                padding="VALID",
                dtype=self.dtype,
                kernel_init=_hf_init(c.initializer_range),
                name="projection",
            )(pixel_values)
            return x.reshape(x.shape[0], -1, x.shape[-1])
        p = c.patch_size
        batch, height, width, cin = pixel_values.shape
        gh, gw = height // p, width // p
        x = pixel_values.reshape(batch, gh, p, gw, p, cin)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(batch, gh * gw, p * p * cin)
        return _PatchProjection(
            c, in_channels=cin, dtype=self.dtype, name="projection"
        )(x)


class _PatchProjection(nn.Module):
    """The patch GEMM, scoped so params land at projection/{kernel,bias}
    with nn.Conv's (kh, kw, cin, cout) kernel layout."""

    config: DINOv2Config
    in_channels: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, patches):
        c = self.config
        p = c.patch_size
        kernel = self.param(
            "kernel", _hf_init(c.initializer_range),
            (p, p, self.in_channels, c.hidden_size),
        )
        bias = self.param("bias", nn.initializers.zeros, (c.hidden_size,))
        kernel2d = kernel.reshape(p * p * self.in_channels, c.hidden_size)
        return jnp.dot(
            patches.astype(self.dtype), kernel2d.astype(self.dtype)
        ) + bias.astype(self.dtype)


class _Embeddings(nn.Module):
    config: DINOv2Config
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, pixel_values, deterministic=True):
        c = self.config
        batch = pixel_values.shape[0]
        height, width = pixel_values.shape[1], pixel_values.shape[2]
        cls_token = self.param(
            "cls_token", _hf_init(c.initializer_range), (1, 1, c.hidden_size)
        )
        if c.use_mask_token:
            # kept for checkpoint compatibility; unused in the forward pass
            self.param("mask_token", _hf_init(c.initializer_range), (1, c.hidden_size))
        grid = c.image_size // c.patch_size
        pos_emb = self.param(
            "position_embeddings",
            _hf_init(c.initializer_range),
            (1, grid * grid + 1, c.hidden_size),
        )

        x = _PatchEmbeddings(c, dtype=self.dtype, name="patch_embeddings")(
            pixel_values.astype(self.dtype)
        )
        cls = jnp.broadcast_to(cls_token, (batch, 1, c.hidden_size)).astype(x.dtype)
        x = jnp.concatenate([cls, x], axis=1)
        x = x + _interpolate_pos_encoding(c, x, height, width, pos_emb)
        if c.hidden_dropout_prob > 0:
            x = nn.Dropout(rate=c.hidden_dropout_prob)(x, deterministic=deterministic)
        return x


def _interpolate_pos_encoding(config, hidden_states, height, width, position_embeddings):
    """Bicubic resize of the trained position grid onto the current patch grid.

    All shapes are static under jit, so this folds into the compiled program.
    Matches HF's scale_and_translate call bit-for-bit (including the +0.1
    fudge in the target extent) so cached pretrained outputs agree.
    """
    num_patches = hidden_states.shape[1] - 1
    num_positions = position_embeddings.shape[1] - 1
    if num_patches == num_positions and height == width:
        return position_embeddings.astype(hidden_states.dtype)
    class_pos = position_embeddings[:, :1]
    patch_pos = position_embeddings[:, 1:]
    dim = hidden_states.shape[-1]
    h = height // config.patch_size
    w = width // config.patch_size
    src = int(math.sqrt(num_positions))
    patch_pos = patch_pos.reshape(1, src, src, dim).transpose(0, 3, 1, 2)
    scale = jnp.array(
        [(h + 0.1) / src, (w + 0.1) / src], dtype=jnp.float32
    )
    patch_pos = jax.image.scale_and_translate(
        patch_pos.astype(jnp.float32),
        shape=(1, dim, h, w),
        spatial_dims=(2, 3),
        scale=scale,
        translation=jnp.zeros(2, jnp.float32),
        method="bicubic",
        antialias=False,
    )
    patch_pos = patch_pos.transpose(0, 2, 3, 1).reshape(1, -1, dim)
    out = jnp.concatenate([class_pos, patch_pos], axis=1)
    return out.astype(hidden_states.dtype)


class _FusedLayerNorm(nn.Module):
    """LayerNorm with nn.LayerNorm-compatible params ("scale"/"bias") backed
    by the single-pass Pallas kernel (ops/layer_norm.py). Inference-only
    paths (no custom VJP); training keeps nn.LayerNorm."""

    epsilon: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (d,))
        bias = self.param("bias", nn.initializers.zeros, (d,))
        from hypervla_tpu.ops.layer_norm import layer_norm

        # statistics in fp32 on the UNCAST input (nn.LayerNorm semantics);
        # only the output drops to the compute dtype
        return layer_norm(x, scale, bias, eps=self.epsilon).astype(self.dtype)


class _DotLayerNorm(nn.Module):
    """LayerNorm whose mean/E[x^2] reductions run as MXU ones-dots.

    At the bs=1 serving geometry ([257,768] rows) XLA lowers LayerNorm to a
    VPU cross-lane reduce fusion measured at ~22 us — twelve of them are
    half the 0.53 ms serving step (round-3 profile, scripts/profile_serving).
    Backed by ops/layer_norm.py::layer_norm_dot: ones-dot statistics on the
    MXU (fp32 accumulation, flax fast-variance semantics) with a custom VJP
    whose backward reductions are MXU dots as well — usable for both
    serving and the bf16 training trunk. Enable with fused_ln="dot".
    """

    epsilon: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (d,))
        bias = self.param("bias", nn.initializers.zeros, (d,))
        from hypervla_tpu.ops.layer_norm import layer_norm_dot

        return layer_norm_dot(x, scale, bias, self.epsilon).astype(
            self.dtype
        )


class _PallasTrainLayerNorm(nn.Module):
    """Differentiable single-HBM-pass Pallas LayerNorm (training geometry).

    Backed by ops/layer_norm.py::layer_norm_pallas — VMEM-resident tiles
    with MXU-dot statistics and a custom VJP whose dscale/dbias column
    sums accumulate in-kernel. For large-batch bf16 training where XLA's
    cross-lane LN reduce fusions are the bottleneck; enable with
    fused_ln="pallas_train"."""

    epsilon: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (d,))
        bias = self.param("bias", nn.initializers.zeros, (d,))
        from hypervla_tpu.ops.layer_norm import layer_norm_pallas

        return layer_norm_pallas(x, scale, bias, self.epsilon).astype(
            self.dtype
        )


class _LayerScaleVector(nn.Module):
    """_LayerScale's parameter as a vector, without applying the multiply.

    Same module/param names as _LayerScale so checkpoints are identical;
    used by the fused residual boundary, where the multiply happens inside
    the Pallas kernel (ops/add_layer_norm.py::fused_add_scale_ln).
    """

    config: DINOv2Config

    @nn.compact
    def __call__(self):
        lambda1 = self.param(
            "lambda1", nn.initializers.ones, (self.config.hidden_size,)
        )
        return self.config.layerscale_value * lambda1  # fp32 (d,)


class _FusedAddLayerNorm(nn.Module):
    """LayerScale + residual add + LayerNorm as one Pallas pass.

    (x, delta, ls) -> (x + ls*delta, LN(x + ls*delta) * scale + bias).
    Param names match nn.LayerNorm ("scale"/"bias") so checkpoints are
    layout-identical whether or not the fusion is enabled. Backed by
    ops/add_layer_norm.py::fused_add_scale_ln — the whole residual
    boundary must ride inside the kernel (round-3 lever bisection: a
    standalone Pallas LN loses to XLA's add+stat shared fusions, and the
    first fused_add_ln variant left the LayerScale multiplies unfused,
    7.9 ms of standalone broadcast multiplies at bs=64).
    """

    epsilon: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, delta, ls):
        d = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (d,))
        bias = self.param("bias", nn.initializers.zeros, (d,))
        from hypervla_tpu.ops.add_layer_norm import fused_add_scale_ln

        xn, y = fused_add_scale_ln(
            x, delta.astype(x.dtype), ls, scale, bias, self.epsilon
        )
        return xn, y.astype(self.dtype)


def _layer_norm(config, dtype, fused, name):
    """fused: False -> flax nn.LayerNorm; True -> Pallas single-pass kernel;
    "dot" -> MXU ones-dot statistics (fastest at bs=1 serving geometry);
    "pallas_train" -> differentiable single-pass Pallas kernel."""
    if fused == "pallas_train":
        return _PallasTrainLayerNorm(
            epsilon=config.layer_norm_eps, dtype=dtype, name=name
        )
    if fused == "dot":
        return _DotLayerNorm(
            epsilon=config.layer_norm_eps, dtype=dtype, name=name
        )
    if fused:
        return _FusedLayerNorm(
            epsilon=config.layer_norm_eps, dtype=dtype, name=name
        )
    return nn.LayerNorm(epsilon=config.layer_norm_eps, dtype=dtype, name=name)


class _SelfAttention(nn.Module):
    config: DINOv2Config
    dtype: Dtype = jnp.float32
    use_flash: bool = False
    flash_trainable: bool = False
    # softmax with the exp-sum (fwd) and sum(g*p) (bwd) reductions on the
    # MXU (ops/layer_norm.py::softmax_dot) — pairs with fused_ln="dot"
    dot_softmax: bool = False
    fused_attention: bool = False

    @nn.compact
    def __call__(self, hidden_states, output_attentions=False):
        c = self.config
        head_dim = c.hidden_size // c.num_attention_heads
        dense = lambda name: nn.Dense(
            c.hidden_size,
            dtype=self.dtype,
            kernel_init=_hf_init(c.initializer_range),
            name=name,
        )
        if self.fused_attention and not output_attentions:
            # geometry-tuned Pallas MHA (ops/fused_attention.py): consumes
            # the Dense outputs in [B,S,H*D] layout directly — the XLA
            # einsum path's head-major transposes, fp32 softmax stat
            # fusions and probability casts (~41 ms of the bs=64 flagship
            # step, round-3 profile) never materialize
            from hypervla_tpu.ops.fused_attention import mha_fused_train

            qf = dense("query")(hidden_states)
            kf = dense("key")(hidden_states)
            vf = dense("value")(hidden_states)
            flat = hidden_states.ndim == 3
            if not flat:  # leading dims beyond batch: flatten for the grid
                lead = qf.shape[:-2]
                qf, kf, vf = (
                    t.reshape((-1,) + t.shape[-2:]) for t in (qf, kf, vf)
                )
            out = mha_fused_train(
                qf.astype(jnp.bfloat16),
                kf.astype(jnp.bfloat16),
                vf.astype(jnp.bfloat16),
                c.num_attention_heads,
                float(1.0 / math.sqrt(head_dim)),
            ).astype(self.dtype)
            if not flat:
                out = out.reshape(lead + out.shape[-2:])
            return (out,)

        shape = hidden_states.shape[:2] + (c.num_attention_heads, head_dim)
        q = dense("query")(hidden_states).reshape(shape)
        k = dense("key")(hidden_states).reshape(shape)
        v = dense("value")(hidden_states).reshape(shape)

        if self.use_flash and not output_attentions:
            if self.flash_trainable:
                # differentiable flash (custom VJP recomputes attention in
                # the backward pass): the (heads, L, L) probability tensors
                # never hit HBM — usable under grad
                from hypervla_tpu.ops.flash_attention import (
                    mha_flash_trainable,
                )

                attn_output = mha_flash_trainable(q, k, v)
            else:
                # forward-only serving kernel (round-1 measured path)
                from hypervla_tpu.ops.flash_attention import mha_flash

                attn_output = mha_flash(q, k, v)
            attn_output = attn_output.reshape(attn_output.shape[:2] + (-1,))
            return (attn_output,)

        q = q / jnp.sqrt(head_dim).astype(self.dtype)
        attn_weights = jnp.einsum("...qhd,...khd->...hqk", q, k)
        # softmax internals in fp32 for stability; probabilities are stored
        # (and kept for backward) in the compute dtype — at bf16 this halves
        # the dominant HBM term of the trunk's backward pass, the
        # (batch, heads, 257, 257) probability tensors
        if self.dot_softmax:
            from hypervla_tpu.ops.layer_norm import softmax_dot

            attn_weights = softmax_dot(attn_weights).astype(self.dtype)
        else:
            attn_weights = jax.nn.softmax(
                attn_weights.astype(jnp.float32), axis=-1
            ).astype(self.dtype)
        attn_output = jnp.einsum("...hqk,...khd->...qhd", attn_weights, v)
        attn_output = attn_output.reshape(attn_output.shape[:2] + (-1,))
        if output_attentions:
            return attn_output, attn_weights
        return (attn_output,)


class _Attention(nn.Module):
    config: DINOv2Config
    dtype: Dtype = jnp.float32
    use_flash: bool = False
    flash_trainable: bool = False
    dot_softmax: bool = False
    fused_attention: bool = False

    @nn.compact
    def __call__(self, hidden_states, output_attentions=False):
        outputs = _SelfAttention(
            self.config, dtype=self.dtype, use_flash=self.use_flash,
            flash_trainable=self.flash_trainable,
            dot_softmax=self.dot_softmax,
            fused_attention=self.fused_attention, name="attention",
        )(hidden_states, output_attentions=output_attentions)
        attn = _SelfOutput(self.config, dtype=self.dtype, name="output")(outputs[0])
        return (attn,) + outputs[1:]


class _SelfOutput(nn.Module):
    config: DINOv2Config
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_states):
        return nn.Dense(
            self.config.hidden_size,
            kernel_init=_hf_init(self.config.initializer_range),
            dtype=self.dtype,
            name="dense",
        )(hidden_states)


class _LayerScale(nn.Module):
    config: DINOv2Config
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        lambda1 = self.param(
            "lambda1", nn.initializers.ones, (self.config.hidden_size,)
        )
        # cast the (fp32) scale to the compute dtype BEFORE multiplying:
        # otherwise promotion silently upcasts the whole residual stream to
        # fp32 from layer 0 on, doubling the VPU/HBM traffic of every
        # LayerNorm and residual add in a bf16 trunk (the round-2 profile's
        # "12 x 23us fp32 LN fusions")
        scale = (self.config.layerscale_value * lambda1).astype(self.dtype)
        return scale * x


@jax.custom_vjp
def _gelu_exact(x):
    # jax.nn.gelu(approximate=False)'s erfc formulation, evaluated in fp32
    # and rounded once to the input dtype. The Pallas forward
    # (HYPERVLA_FUSED_GELU=1) is OFF by default: measured LOSSES at both
    # geometries — bs=1 serving 0.565 -> 0.722 ms (12 tiny custom-calls
    # serialize against XLA's weight prefetch) and bs=64 training
    # 168.2 -> 181.6 ms even after removing its pad copies (XLA fuses this
    # expression into the fc1 GEMM epilogue for free; an opaque
    # custom-call is a schedule barrier). See PERF.md round-3 bisection.
    # The custom VJP below (bf16 residual) is the part that wins and is
    # always on.
    import os

    if (os.environ.get("HYPERVLA_FUSED_GELU", "0") == "1"
            and x.size >= 4 * 257 * 3072):
        from hypervla_tpu.ops.gelu import gelu_exact_fused

        return gelu_exact_fused(x)
    xf = x.astype(jnp.float32)
    return (0.5 * xf * jax.lax.erfc(-xf * math.sqrt(0.5))).astype(x.dtype)


def _gelu_exact_fwd(x):
    # save the input in ITS dtype: the default VJP of the erfc-based exact
    # gelu keeps a promoted fp32 copy of the [B,257,3072] pre-activation
    # alive for backward (~100 MB per layer at bs=32 on the bf16 trunk),
    # written in forward and re-read in backward — an HBM-bandwidth sink the
    # round-2 profile named. A bf16 residual halves that traffic; the
    # derivative is recomputed in fp32 from it.
    return _gelu_exact(x), x


def _gelu_exact_bwd(x, g):
    xf = x.astype(jnp.float32)
    cdf = 0.5 * jax.lax.erfc(-xf * math.sqrt(0.5))
    pdf = jnp.exp(-0.5 * xf * xf) * (1.0 / math.sqrt(2 * math.pi))
    return ((cdf + xf * pdf).astype(g.dtype) * g,)


_gelu_exact.defvjp(_gelu_exact_fwd, _gelu_exact_bwd)


class _MLP(nn.Module):
    config: DINOv2Config
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.config
        x = nn.Dense(
            c.hidden_size * c.mlp_ratio,
            kernel_init=_hf_init(c.initializer_range),
            dtype=self.dtype,
            name="fc1",
        )(x)
        if x.dtype == jnp.float32:
            # fp32 trunk: keep jax's gelu so fp32 goldens/numeric pins stay
            # bitwise-identical (the custom VJP is analytically equal but
            # rounds differently)
            x = nn.gelu(x, approximate=False)
        else:
            x = _gelu_exact(x)
        return nn.Dense(
            c.hidden_size,
            kernel_init=_hf_init(c.initializer_range),
            dtype=self.dtype,
            name="fc2",
        )(x)


class _SwiGLUFFN(nn.Module):
    config: DINOv2Config
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.config
        hidden = int(c.hidden_size * c.mlp_ratio * 2 / 3 + 7) // 8 * 8
        x12 = nn.Dense(
            2 * hidden, kernel_init=_hf_init(c.initializer_range),
            dtype=self.dtype, name="weights_in",
        )(x)
        x1, x2 = jnp.split(x12, 2, axis=-1)
        return nn.Dense(
            c.hidden_size, kernel_init=_hf_init(c.initializer_range),
            dtype=self.dtype, name="weights_out",
        )(nn.silu(x1) * x2)


class _Layer(nn.Module):
    config: DINOv2Config
    dtype: Dtype = jnp.float32
    use_flash: bool = False
    flash_trainable: bool = False
    fused_ln: Union[bool, str] = False
    dot_softmax: bool = False
    fused_attention: bool = False
    # fuse each residual add with the LayerNorm that consumes it
    # (ops/add_layer_norm.py). The layer then RETURNS its final residual
    # delta un-added so the NEXT layer's norm1 can absorb the add; the
    # collection completes the last one. Training-geometry lever.
    fused_add_ln: bool = False

    @nn.compact
    def __call__(self, hidden_states, output_attentions=False,
                 pending_delta=None):
        c = self.config
        if self.fused_add_ln and not output_attentions:
            if pending_delta is None:
                normed = _layer_norm(c, self.dtype, self.fused_ln, "norm1")(
                    hidden_states
                )
            else:
                delta, ls = pending_delta
                hidden_states, normed = _FusedAddLayerNorm(
                    epsilon=c.layer_norm_eps, dtype=self.dtype, name="norm1"
                )(hidden_states, delta, ls)
            attn_outputs = _Attention(
                c, dtype=self.dtype, use_flash=self.use_flash,
                flash_trainable=self.flash_trainable,
                dot_softmax=self.dot_softmax,
                fused_attention=self.fused_attention, name="attention",
            )(normed, output_attentions=False)
            ls1 = _LayerScaleVector(c, name="layer_scale1")()
            hidden_states, y = _FusedAddLayerNorm(
                epsilon=c.layer_norm_eps, dtype=self.dtype, name="norm2"
            )(hidden_states, attn_outputs[0], ls1)
            if c.use_swiglu_ffn:
                y = _SwiGLUFFN(c, dtype=self.dtype, name="mlp")(y)
            else:
                y = _MLP(c, dtype=self.dtype, name="mlp")(y)
            ls2 = _LayerScaleVector(c, name="layer_scale2")()
            return hidden_states, (y, ls2)

        normed = _layer_norm(c, self.dtype, self.fused_ln, "norm1")(
            hidden_states
        )
        attn_outputs = _Attention(
            c, dtype=self.dtype, use_flash=self.use_flash,
            flash_trainable=self.flash_trainable,
            dot_softmax=self.dot_softmax,
            fused_attention=self.fused_attention, name="attention"
        )(normed, output_attentions=output_attentions)
        attn = _LayerScale(c, dtype=self.dtype, name="layer_scale1")(
            attn_outputs[0]
        )
        hidden_states = attn + hidden_states

        y = _layer_norm(c, self.dtype, self.fused_ln, "norm2")(hidden_states)
        if c.use_swiglu_ffn:
            y = _SwiGLUFFN(c, dtype=self.dtype, name="mlp")(y)
        else:
            y = _MLP(c, dtype=self.dtype, name="mlp")(y)
        y = _LayerScale(c, dtype=self.dtype, name="layer_scale2")(y)
        return (y + hidden_states,) + attn_outputs[1:]


def _remat_policy(name):
    """Named jax.checkpoint policies for the trunk layers.

    "dots": save matmul outputs (already produced on the MXU, needed for the
    weight gradients anyway), recompute everything elementwise — LayerNorm,
    GELU/erf, softmax — in the backward pass. On TPU this removes the big
    fp32 elementwise intermediates (e.g. the [B,257,3072] erf input the
    exact-GELU VJP keeps) that make the backward HBM-bandwidth-bound, at the
    cost of cheap VPU recompute. "nothing": save only layer inputs (max
    memory saving, recomputes the matmuls too — the fit-bigger-batches
    lever).
    """
    return {
        "dots": jax.checkpoint_policies.checkpoint_dots,
        "dots_no_batch": (
            jax.checkpoint_policies.checkpoint_dots_with_no_batch_dims
        ),
        "nothing": jax.checkpoint_policies.nothing_saveable,
    }[name]


class _LayerCollection(nn.Module):
    config: DINOv2Config
    dtype: Dtype = jnp.float32
    use_flash: bool = False
    flash_trainable: bool = False
    fused_ln: Union[bool, str] = False
    dot_softmax: bool = False
    fused_attention: bool = False
    fused_add_ln: bool = False
    remat: bool = False
    remat_policy: Optional[str] = None

    @nn.compact
    def __call__(self, hidden_states, output_attentions=False):
        if self.fused_add_ln and not output_attentions:
            assert not (self.remat or self.remat_policy), (
                "fused_add_ln is incompatible with layer remat"
            )
            pending = None
            for i in range(self.config.num_hidden_layers):
                hidden_states, pending = _Layer(
                    self.config, dtype=self.dtype,
                    use_flash=self.use_flash,
                    flash_trainable=self.flash_trainable,
                    fused_ln=self.fused_ln, dot_softmax=self.dot_softmax,
                    fused_attention=self.fused_attention,
                    fused_add_ln=True, name=str(i),
                )(hidden_states, False, pending)
            # the last layer's residual add has no following norm1: plain
            # add with the same per-op bf16 roundings as _LayerScale + add
            delta, ls = pending
            hidden_states = (
                hidden_states + ls.astype(hidden_states.dtype) * delta
            ).astype(hidden_states.dtype)
            return hidden_states, None
        all_attentions = () if output_attentions else None
        layer_cls = _Layer
        if self.remat_policy is not None:
            layer_cls = nn.remat(
                _Layer, static_argnums=(2,),
                policy=_remat_policy(self.remat_policy),
            )
        elif self.remat:
            # rematerialize each layer's activations in the backward pass:
            # trades recompute for the O(layers * tokens * width) residual
            # stream memory — the standard fit-bigger-batches lever
            layer_cls = nn.remat(_Layer, static_argnums=(2,))
        for i in range(self.config.num_hidden_layers):
            outputs = layer_cls(
                self.config, dtype=self.dtype, use_flash=self.use_flash,
                flash_trainable=self.flash_trainable,
                fused_ln=self.fused_ln, dot_softmax=self.dot_softmax,
            fused_attention=self.fused_attention,
                name=str(i),
            )(hidden_states, output_attentions)
            hidden_states = outputs[0]
            if output_attentions:
                all_attentions += (outputs[1],)
        return hidden_states, all_attentions


class _ScanBlock(nn.Module):
    """One transformer layer shaped as a scan body (carry = hidden states)."""

    config: DINOv2Config
    dtype: Dtype = jnp.float32
    use_flash: bool = False
    flash_trainable: bool = False
    fused_ln: Union[bool, str] = False
    dot_softmax: bool = False
    fused_attention: bool = False

    @nn.compact
    def __call__(self, carry, _):
        out = _Layer(
            self.config, dtype=self.dtype, use_flash=self.use_flash,
            flash_trainable=self.flash_trainable,
            fused_ln=self.fused_ln, dot_softmax=self.dot_softmax,
            fused_attention=self.fused_attention,
            name="layer",
        )(carry)
        # fp32 layer-scale params upcast the residual; keep the carry dtype
        return out[0].astype(carry.dtype), None


def _kernel_layer_init(config):
    """Init for one `_KernelLayerCollection` layer: a pytree-valued param
    whose nested dict matches `_Layer`'s module tree leaf-for-leaf (names,
    shapes, dtypes, initializer families), so checkpoints move between the
    kernel and module paths without conversion."""
    import zlib

    c = config
    hidden = c.hidden_size
    mlp = c.mlp_ratio * hidden
    kinit = _hf_init(c.initializer_range)

    def init(rng):
        def key(path):
            return jax.random.fold_in(rng, zlib.crc32(path.encode()))

        def dense(path, fin, fout):
            return {
                "kernel": kinit(key(path), (fin, fout), jnp.float32),
                "bias": jnp.zeros((fout,), jnp.float32),
            }

        def norm():
            return {
                "scale": jnp.ones((hidden,), jnp.float32),
                "bias": jnp.zeros((hidden,), jnp.float32),
            }

        return {
            "norm1": norm(),
            "attention": {
                "attention": {
                    "query": dense("query", hidden, hidden),
                    "key": dense("key", hidden, hidden),
                    "value": dense("value", hidden, hidden),
                },
                "output": {"dense": dense("output", hidden, hidden)},
            },
            "layer_scale1": {"lambda1": jnp.ones((hidden,), jnp.float32)},
            "norm2": norm(),
            "mlp": {
                "fc1": dense("fc1", hidden, mlp),
                "fc2": dense("fc2", mlp, hidden),
            },
            "layer_scale2": {"lambda1": jnp.ones((hidden,), jnp.float32)},
        }

    return init


class _KernelLayerCollection(nn.Module):
    """The trunk layers as one Pallas custom call per layer, forward and
    backward (ops/dino_layer_train.py) — the round-4 structural training
    lever. Param tree is layout-identical to `_LayerCollection`
    (encoder/layer/<i>/...), declared as pytree-valued params. bf16 only;
    pair with config["hoist_shared_trunk"] so weight cotangents accumulate
    across the batch grid instead of per-vmap-sample."""

    config: DINOv2Config
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, hidden_states, output_attentions=False):
        c = self.config
        assert not output_attentions, (
            "the Pallas layer kernel does not capture attention maps"
        )
        assert jnp.dtype(self.dtype) == jnp.bfloat16, (
            "dino_layer_train is a bf16 kernel; set encoder_dtype=bfloat16"
        )
        assert not c.use_swiglu_ffn, "layer kernel covers the MLP trunk only"
        from hypervla_tpu.ops.dino_layer_train import dino_layer_train

        f32 = lambda a: jnp.asarray(a, jnp.float32)  # noqa: E731
        b16 = lambda a: jnp.asarray(a, jnp.bfloat16)  # noqa: E731
        lsv = jnp.float32(c.layerscale_value)
        x = hidden_states.astype(jnp.bfloat16)
        for i in range(c.num_hidden_layers):
            lp = self.param(str(i), _kernel_layer_init(c))
            att = lp["attention"]["attention"]
            out = lp["attention"]["output"]["dense"]
            pv = jnp.stack([
                f32(att["query"]["bias"]), f32(att["key"]["bias"]),
                f32(att["value"]["bias"]), f32(out["bias"]),
                f32(lp["mlp"]["fc2"]["bias"]),
                f32(lp["norm1"]["scale"]), f32(lp["norm1"]["bias"]),
                f32(lp["norm2"]["scale"]), f32(lp["norm2"]["bias"]),
                lsv * f32(lp["layer_scale1"]["lambda1"]),
                lsv * f32(lp["layer_scale2"]["lambda1"]),
            ])
            x = dino_layer_train(
                x,
                b16(att["query"]["kernel"]), b16(att["key"]["kernel"]),
                b16(att["value"]["kernel"]), b16(out["kernel"]),
                b16(lp["mlp"]["fc1"]["kernel"]),
                b16(lp["mlp"]["fc2"]["kernel"]),
                pv, f32(lp["mlp"]["fc1"]["bias"])[None],
                c.num_attention_heads, c.layer_norm_eps,
            )
        return x, None


class _Encoder(nn.Module):
    config: DINOv2Config
    dtype: Dtype = jnp.float32
    use_flash: bool = False
    flash_trainable: bool = False
    scan_layers: bool = False
    fused_ln: Union[bool, str] = False
    dot_softmax: bool = False
    fused_attention: bool = False
    fused_add_ln: bool = False
    remat: bool = False
    remat_policy: Optional[str] = None
    layer_kernel: bool = False

    @nn.compact
    def __call__(self, hidden_states, output_attentions=False):
        if self.layer_kernel:
            return _KernelLayerCollection(
                self.config, dtype=self.dtype, name="layer"
            )(hidden_states, output_attentions=output_attentions)
        if self.scan_layers:
            # stacked layer params walked by lax.scan: the whole trunk is ~16
            # parameter buffers instead of ~16 x num_layers. Cuts per-call
            # host dispatch (one runtime handle per buffer per step) and
            # compiled-program size; the standard TPU big-model layout.
            assert not output_attentions, (
                "scan_layers does not support output_attentions; build the "
                "model with scan_layers=False to capture attention maps"
            )
            scan = nn.scan(
                _ScanBlock,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                length=self.config.num_hidden_layers,
            )
            hidden_states, _ = scan(
                self.config, dtype=self.dtype, use_flash=self.use_flash,
            flash_trainable=self.flash_trainable,
                fused_ln=self.fused_ln, name="layers",
            )(hidden_states, None)
            return hidden_states, None
        return _LayerCollection(
            self.config, dtype=self.dtype, use_flash=self.use_flash,
            flash_trainable=self.flash_trainable,
            fused_ln=self.fused_ln, dot_softmax=self.dot_softmax,
            fused_attention=self.fused_attention,
            fused_add_ln=self.fused_add_ln,
            remat=self.remat,
            remat_policy=self.remat_policy, name="layer",
        )(hidden_states, output_attentions=output_attentions)


class DINOv2Model(nn.Module):
    """DINOv2 trunk. Input NHWC pixel values (already mean/std normalized)."""

    config: DINOv2Config
    dtype: Dtype = jnp.float32
    # fused Pallas attention (TPU; not used when attention maps are requested)
    use_flash: bool = False
    flash_trainable: bool = False
    # stacked layer params + lax.scan over layers (serving fast path; does
    # not support output_attentions). Convert loop-layout checkpoints with
    # `stack_layer_params`.
    scan_layers: bool = False
    # single-pass Pallas LayerNorm (inference-only serving path)
    fused_ln: Union[bool, str] = False
    dot_softmax: bool = False
    fused_attention: bool = False
    # fuse each residual add into the LayerNorm that consumes it
    # (ops/add_layer_norm.py; bf16 training fast path)
    fused_add_ln: bool = False
    # rematerialize layer activations in backward (fit bigger batches)
    remat: bool = False
    # named jax.checkpoint policy for the layers (see _remat_policy);
    # "dots" = keep MXU outputs, recompute elementwise — the
    # bandwidth-over-FLOPs training default. Overrides `remat`.
    remat_policy: Optional[str] = None
    # "pallas_serving": run the 12 layers as ONE Pallas weight-streaming
    # kernel (ops/dino_layer.py; bs=1 bf16 inference only). Layer weights
    # come pre-stacked through the "trunk_kernel" variable collection
    # (ops/serving.py::prepare_serving_params builds it once per episode);
    # the per-layer "params" leaves are unused on this path.
    # "scan_serving": same stacked weights, same roundings, but an XLA
    # lax.scan layer body instead of the Mosaic custom call — loads
    # instantly on tunneled backends where the Pallas program's first
    # execution costs minutes (see ops/dino_layer.py).
    layers_impl: Optional[str] = None

    @nn.compact
    def __call__(
        self,
        pixel_values: jax.Array,
        deterministic: bool = True,
        output_attentions: bool = False,
    ) -> DINOv2Output:
        x = _Embeddings(self.config, dtype=self.dtype, name="embeddings")(
            pixel_values, deterministic=deterministic
        )
        if self.layers_impl in (
            "pallas_serving", "scan_serving", "unroll_serving"
        ):
            assert not output_attentions, (
                "the stacked serving trunks do not capture attention maps"
            )
            if not self.has_variable("trunk_kernel", "w"):
                raise ValueError(
                    f"layers_impl='{self.layers_impl}' needs the stacked "
                    "trunk weights: apply with a 'trunk_kernel' collection "
                    "(see ops/serving.py::prepare_serving_params)"
                )
            from hypervla_tpu.ops.dino_layer import (
                dino_layers_serving,
                dino_layers_serving_scan,
                dino_layers_serving_unroll,
            )

            assert x.shape[0] == 1, "stacked serving trunks are bs=1"
            trunk = {
                "pallas_serving": dino_layers_serving,
                "scan_serving": dino_layers_serving_scan,
                # statically-unrolled scan twin: the weight fetch fuses
                # into the dots instead of a serial dynamic-slice copy
                # pass (ops/dino_layer.py::dino_layers_serving_unroll)
                "unroll_serving": dino_layers_serving_unroll,
            }[self.layers_impl]
            x = trunk(
                x[0].astype(jnp.bfloat16),
                self.get_variable("trunk_kernel", "w"),
                self.get_variable("trunk_kernel", "b"),
                self.get_variable("trunk_kernel", "p"),
                eps=self.config.layer_norm_eps,
            )[None]
            attentions = None
        else:
            x, attentions = _Encoder(
                self.config, dtype=self.dtype, use_flash=self.use_flash,
                flash_trainable=self.flash_trainable,
                scan_layers=self.scan_layers, fused_ln=self.fused_ln,
                dot_softmax=self.dot_softmax,
                fused_attention=self.fused_attention,
                fused_add_ln=self.fused_add_ln and not output_attentions,
                remat=self.remat, remat_policy=self.remat_policy,
                # "pallas_train": every layer as one differentiable Pallas
                # custom call, forward and backward (ops/dino_layer_train.py)
                layer_kernel=self.layers_impl == "pallas_train",
                name="encoder",
            )(x, output_attentions=output_attentions)
        x = _layer_norm(
            self.config, self.dtype, self.fused_ln, "layernorm"
        )(x)
        return DINOv2Output(
            last_hidden_state=x.astype(jnp.float32), attentions=attentions
        )


def stack_layer_params(dino_params):
    """Converts a loop-layout DINOv2 param tree (encoder/layer/<i>/...) to the
    scan layout (encoder/layers/layer/... with a leading layer axis).

    Use when loading an HF-layout / training checkpoint into a model built
    with `scan_layers=True`. Leaves outside encoder/layer are untouched.
    """
    import numpy as np

    params = dict(dino_params)
    layer_tree = params["encoder"].get("layer")
    if layer_tree is None:  # already scan layout
        return dino_params
    indices = sorted(layer_tree.keys(), key=int)

    def _stack(*leaves):
        return np.stack([np.asarray(l) for l in leaves])

    stacked = jax.tree_util.tree_map(_stack, *[layer_tree[i] for i in indices])
    params["encoder"] = {"layers": {"layer": stacked}}
    return params


def unstack_layer_params(dino_params):
    """Inverse of `stack_layer_params` (scan layout -> loop layout)."""
    import numpy as np

    params = dict(dino_params)
    scan_tree = params["encoder"].get("layers")
    if scan_tree is None:  # already loop layout
        return dino_params
    layer_tree = scan_tree["layer"]
    n = jax.tree_util.tree_leaves(layer_tree)[0].shape[0]
    params["encoder"] = {
        "layer": {
            str(i): jax.tree_util.tree_map(
                lambda x, i=i: np.asarray(x)[i], layer_tree
            )
            for i in range(n)
        }
    }
    return params
