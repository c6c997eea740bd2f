"""EfficientNet backbone (b0-b7), FiLM-free variant.

Capability parity with hypervla/components/efficient_net.py. A reference
quirk is preserved deliberately: batch norm is replaced by LayerNorm
(efficient_net.py:283-292), which makes the backbone stateless — convenient
when its weights are generated or shared per sample. Stochastic depth draws
from the 'drop_connect' rng stream.

Structure: the width/depth scaling rules resolve the whole network into a
static per-block plan (`expand_block_plan`) before any module runs, so the
forward pass is one flat loop over resolved block specs instead of config
mutation inside the call.
"""
import math
from dataclasses import dataclass, field, replace
from typing import Any, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax.linen import initializers

MEAN_RGB = [0.485, 0.456, 0.406]
STDDEV_RGB = [0.229, 0.224, 0.225]

conv_kernel_init_fn = initializers.variance_scaling(2.0, "fan_out", "normal")
dense_kernel_init_fn = initializers.variance_scaling(
    1 / 3.0, "fan_out", "uniform"
)


@dataclass
class BlockConfig:
    """One MBConv stage before depth/width scaling."""

    input_filters: int = 0
    output_filters: int = 0
    kernel_size: int = 3
    num_repeat: int = 1
    expand_ratio: int = 1
    strides: Tuple[int, int] = (1, 1)
    se_ratio: Optional[float] = None
    id_skip: bool = True
    fused_conv: bool = False
    conv_type: str = "depthwise"
    drop_rate: float = 0.0  # filled in by expand_block_plan


# the EfficientNet-B0 stage table every variant scales from
_B0_STAGES = (
    # in, out, kernel, repeat, expand, strides, se
    (32, 16, 3, 1, 1, (1, 1), 0.25),
    (16, 24, 3, 2, 6, (2, 2), 0.25),
    (24, 40, 5, 2, 6, (2, 2), 0.25),
    (40, 80, 3, 3, 6, (2, 2), 0.25),
    (80, 112, 5, 3, 6, (1, 1), 0.25),
    (112, 192, 5, 4, 6, (2, 2), 0.25),
    (192, 320, 3, 1, 6, (1, 1), 0.25),
)


def _b0_blocks():
    return tuple(
        BlockConfig(i, o, k, r, e, s, se)
        for i, o, k, r, e, s, se in _B0_STAGES
    )


@dataclass
class ModelConfig:
    """Model-level configuration (defaults: EfficientNet-B0)."""

    width_coefficient: float = 1.0
    depth_coefficient: float = 1.0
    resolution: int = 224
    dropout_rate: float = 0.2
    blocks: Tuple[BlockConfig, ...] = field(default_factory=_b0_blocks)
    stem_base_filters: int = 32
    top_base_filters: int = 1280
    activation: str = "swish"
    batch_norm: str = "default"
    bn_momentum: float = 0.99
    bn_epsilon: float = 1e-3
    weight_decay: float = 5e-6
    drop_connect_rate: float = 0.2
    depth_divisor: int = 8
    min_depth: Optional[int] = None
    use_se: bool = True
    input_channels: int = 3
    num_classes: int = 1000
    model_name: str = "efficientnet"
    rescale_input: bool = True
    data_format: str = "channels_last"
    final_projection_size: int = 0
    classifier_head: bool = True
    dtype: Any = jnp.float32


def _scaled_variant(width, depth, res, dropout):
    return ModelConfig(
        width_coefficient=width, depth_coefficient=depth,
        resolution=res, dropout_rate=dropout,
    )


MODEL_CONFIGS = {
    f"efficientnet-b{i}": _scaled_variant(*spec)
    for i, spec in enumerate([
        (1.0, 1.0, 224, 0.2),
        (1.0, 1.1, 240, 0.2),
        (1.1, 1.2, 260, 0.3),
        (1.2, 1.4, 300, 0.3),
        (1.4, 1.8, 380, 0.4),
        (1.6, 2.2, 456, 0.4),
        (1.8, 2.6, 528, 0.5),
        (2.0, 3.1, 600, 0.5),
    ])
}


def round_filters(filters: int, config: ModelConfig) -> int:
    """Width scaling, snapped to the depth divisor (never dropping more
    than 10%)."""
    if not config.width_coefficient:
        return filters
    divisor = config.depth_divisor
    scaled = filters * config.width_coefficient
    floor = config.min_depth or divisor
    snapped = max(floor, int(scaled + divisor / 2) // divisor * divisor)
    if snapped < 0.9 * scaled:
        snapped += divisor
    return int(snapped)


def round_repeats(repeats: int, depth_coefficient: float) -> int:
    return int(math.ceil(depth_coefficient * repeats))


def expand_block_plan(config: ModelConfig) -> Sequence[BlockConfig]:
    """Resolves the stage table into the full per-block sequence: width
    scaling applied, repeats unrolled (repeats after the first run at
    stride 1 with input=output), and the stochastic-depth rate ramped
    linearly over block index."""
    total = sum(
        round_repeats(b.num_repeat, config.depth_coefficient)
        for b in config.blocks
    )
    plan, idx = [], 0
    for stage in config.blocks:
        assert stage.num_repeat > 0
        resolved = replace(
            stage,
            input_filters=round_filters(stage.input_filters, config),
            output_filters=round_filters(stage.output_filters, config),
            num_repeat=round_repeats(
                stage.num_repeat, config.depth_coefficient
            ),
        )
        for rep in range(resolved.num_repeat):
            block = replace(
                resolved,
                drop_rate=config.drop_connect_rate * idx / total,
            )
            if rep > 0:
                block = replace(
                    block,
                    input_filters=block.output_filters,
                    strides=(1, 1),
                )
            plan.append(block)
            idx += 1
    return plan


class DepthwiseConv(nn.Module):
    """Depthwise conv with tensorflow kernel conventions (kernel shape
    (kh, kw, features, 1)), so TF-origin checkpoints port 1:1."""

    features: int
    kernel_size: Tuple[int, int]
    strides: Optional[Tuple[int, int]] = None
    padding: Union[str, Sequence[int]] = "SAME"
    use_bias: bool = True
    dtype: Any = jnp.float32
    kernel_init: Any = initializers.lecun_normal()
    bias_init: Any = initializers.zeros

    @nn.compact
    def __call__(self, inputs: jnp.ndarray) -> jnp.ndarray:
        x = jnp.asarray(inputs, self.dtype)
        kernel = self.param(
            "depthwise_kernel", self.kernel_init,
            self.kernel_size + (self.features, 1),
        )
        # HWIO with one output channel per input channel
        kernel = jnp.asarray(kernel, self.dtype).transpose(0, 1, 3, 2)
        y = jax.lax.conv_general_dilated(
            x, kernel,
            self.strides or (1, 1),
            self.padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=x.shape[-1],
        )
        if self.use_bias:
            y = y + jnp.asarray(
                self.param("bias", self.bias_init, (self.features,)),
                self.dtype,
            )
        return y


def _conv_ln_act(x, features, *, kernel_size=(1, 1), strides=(1, 1),
                 depthwise=False, use_bias=False, activation=None,
                 name=None, dtype=jnp.float32):
    """conv -> LayerNorm (the reference's batch-norm replacement) ->
    optional activation."""
    if isinstance(kernel_size, int):
        kernel_size = (kernel_size, kernel_size)
    conv_cls = DepthwiseConv if depthwise else nn.Conv
    x = conv_cls(
        features, tuple(kernel_size), tuple(strides), padding="SAME",
        use_bias=use_bias, kernel_init=conv_kernel_init_fn,
        name=name or "conv2d", dtype=dtype,
    )(x)
    x = nn.LayerNorm()(x)
    if activation is not None:
        x = getattr(nn.activation, activation.lower())(x)
    return x


def stochastic_depth(inputs, rng, survival_probability,
                     deterministic=False):
    """Drops the whole residual branch per sample with prob 1-p."""
    if survival_probability == 1.0 or deterministic:
        return inputs
    keep = jax.random.bernoulli(
        rng, p=survival_probability,
        shape=(inputs.shape[0],) + (1,) * (inputs.ndim - 1),
    )
    return jnp.where(keep, inputs / survival_probability,
                     jnp.zeros_like(inputs))


class SqueezeExcite(nn.Module):
    """Global-pool -> bottleneck -> sigmoid gate over channels."""

    num_filters: int
    block: BlockConfig
    config: ModelConfig
    train: bool

    @nn.compact
    def __call__(self, inputs: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        reduced = max(
            1, int(self.block.input_filters * self.block.se_ratio)
        )
        gate = nn.avg_pool(inputs, inputs.shape[1:3])
        gate = _conv_ln_act(
            gate, reduced, use_bias=True, activation=cfg.activation,
            name="reduce_conv2d_0", dtype=cfg.dtype,
        )
        gate = _conv_ln_act(
            gate, self.num_filters, use_bias=True, activation="sigmoid",
            name="expand_conv2d_0", dtype=cfg.dtype,
        )
        return inputs * gate


class MBConvBlock(nn.Module):
    """Mobile inverted bottleneck: expand -> depthwise -> SE -> project,
    with a stochastically-dropped identity skip when shapes allow."""

    block: BlockConfig
    config: ModelConfig
    train: bool = False

    @nn.compact
    def __call__(self, inputs: jnp.ndarray) -> jnp.ndarray:
        blk, cfg, train = self.block, self.config, self.train
        dtype = cfg.dtype
        depthwise = blk.conv_type != "no_depthwise"
        expanded = blk.input_filters * blk.expand_ratio

        x = inputs
        if blk.fused_conv:
            x = _conv_ln_act(
                x, expanded, kernel_size=blk.kernel_size,
                strides=blk.strides, activation=cfg.activation,
                name="fused_conv2d_0", dtype=dtype,
            )
        else:
            if blk.expand_ratio != 1:
                x = _conv_ln_act(
                    x, expanded,
                    kernel_size=(1, 1) if depthwise else (3, 3),
                    activation=cfg.activation, name="expand_conv2d_0",
                    dtype=dtype,
                )
            if depthwise:
                x = _conv_ln_act(
                    x, x.shape[-1], kernel_size=blk.kernel_size,
                    strides=blk.strides, activation=cfg.activation,
                    depthwise=True, name="depthwise_conv2d", dtype=dtype,
                )

        if cfg.use_se:
            assert blk.se_ratio is not None and 0 < blk.se_ratio <= 1
            x = SqueezeExcite(
                num_filters=expanded, block=blk, config=cfg, train=train
            )(x)

        x = _conv_ln_act(
            x, blk.output_filters, name="project_conv2d_0", dtype=dtype
        )

        can_skip = (
            blk.id_skip
            and all(s == 1 for s in blk.strides)
            and blk.input_filters == blk.output_filters
        )
        if can_skip:
            if blk.drop_rate > 0:
                x = stochastic_depth(
                    x, self.make_rng("drop_connect"), 1 - blk.drop_rate,
                    deterministic=not train,
                )
            x = x + inputs
        return x


class Stem(nn.Module):
    config: ModelConfig
    train: bool = False

    @nn.compact
    def __call__(self, inputs: jnp.ndarray) -> jnp.ndarray:
        return _conv_ln_act(
            inputs,
            round_filters(self.config.stem_base_filters, self.config),
            kernel_size=(3, 3), strides=(2, 2),
            activation=self.config.activation, dtype=self.config.dtype,
        )


class Head(nn.Module):
    config: Any
    train: bool = True

    @nn.compact
    def __call__(self, inputs: jnp.ndarray) -> jnp.ndarray:
        return _conv_ln_act(
            inputs,
            round_filters(self.config.top_base_filters, self.config),
            activation=self.config.activation, dtype=self.config.dtype,
        )


class EfficientNet(nn.Module):
    config: Any
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs: jnp.ndarray, *, train: bool):
        cfg = replace(self.config, dtype=self.dtype)
        x = Stem(config=cfg, train=train)(jnp.asarray(inputs, self.dtype))
        for block in expand_block_plan(cfg):
            x = MBConvBlock(block=block, config=cfg, train=train)(x)
        return Head(self.config, train=train)(x)
