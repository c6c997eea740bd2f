"""EfficientNet backbone (parity: hypervla/components/efficient_net.py).

Notable reference quirk preserved: batch norm is replaced by LayerNorm
(efficient_net.py:283-292), making the backbone stateless — convenient for
per-sample generated/shared weight handling. Stochastic depth draws from the
'drop_connect' rng stream.
"""
import copy
import math
from typing import Any, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax.linen import initializers

MEAN_RGB = [0.485, 0.456, 0.406]
STDDEV_RGB = [0.229, 0.224, 0.225]

conv_kernel_init_fn = initializers.variance_scaling(2.0, "fan_out", "normal")
dense_kernel_init_fn = initializers.variance_scaling(1 / 3.0, "fan_out",
                                                     "uniform")


class DepthwiseConv(nn.Module):
    """Depthwise conv with tensorflow kernel conventions (kernel shape
    (kh, kw, features, 1)), so checkpoints port 1:1."""

    features: int
    kernel_size: Tuple[int, int]
    strides: Optional[Tuple[int, int]] = None
    padding: Union[str, Sequence[int]] = "SAME"
    input_dilation: Optional[Sequence[int]] = None
    kernel_dilation: Optional[Sequence[int]] = None
    feature_group_count: int = 1
    use_bias: bool = True
    dtype: Any = jnp.float32
    precision: Any = None
    kernel_init: Any = initializers.lecun_normal()
    bias_init: Any = initializers.zeros

    @nn.compact
    def __call__(self, inputs: jnp.ndarray) -> jnp.ndarray:
        inputs = jnp.asarray(inputs, self.dtype)
        in_features = inputs.shape[-1]
        strides = self.strides or (1,) * (inputs.ndim - 2)

        kernel_shape = self.kernel_size + (self.features, 1)
        kernel = self.param("depthwise_kernel", self.kernel_init, kernel_shape)
        kernel = jnp.asarray(kernel, self.dtype).transpose(0, 1, 3, 2)

        dimension_numbers = nn.linear._conv_dimension_numbers(inputs.shape)
        y = jax.lax.conv_general_dilated(
            inputs,
            kernel,
            strides,
            self.padding,
            lhs_dilation=self.input_dilation,
            rhs_dilation=self.kernel_dilation,
            dimension_numbers=dimension_numbers,
            feature_group_count=in_features,
            precision=self.precision,
        )
        if self.use_bias:
            bias = self.param("bias", self.bias_init, (self.features,))
            y = y + jnp.asarray(bias, self.dtype)
        return y


class BlockConfig:
    """Configuration for a single MBConv block."""

    def __init__(
        self,
        input_filters: int = 0,
        output_filters: int = 0,
        kernel_size: int = 3,
        num_repeat: int = 1,
        expand_ratio: int = 1,
        strides: Tuple[int, int] = (1, 1),
        se_ratio: Optional[float] = None,
        id_skip: bool = True,
        fused_conv: bool = False,
        conv_type: str = "depthwise",
    ):
        for arg in locals().items():
            setattr(self, *arg)


class ModelConfig:
    """Model-level configuration (defaults: EfficientNet-B0)."""

    def __init__(
        self,
        width_coefficient: float = 1.0,
        depth_coefficient: float = 1.0,
        resolution: int = 224,
        dropout_rate: float = 0.2,
        blocks: Tuple[BlockConfig, ...] = (
            BlockConfig(32, 16, 3, 1, 1, (1, 1), 0.25),
            BlockConfig(16, 24, 3, 2, 6, (2, 2), 0.25),
            BlockConfig(24, 40, 5, 2, 6, (2, 2), 0.25),
            BlockConfig(40, 80, 3, 3, 6, (2, 2), 0.25),
            BlockConfig(80, 112, 5, 3, 6, (1, 1), 0.25),
            BlockConfig(112, 192, 5, 4, 6, (2, 2), 0.25),
            BlockConfig(192, 320, 3, 1, 6, (1, 1), 0.25),
        ),
        stem_base_filters: int = 32,
        top_base_filters: int = 1280,
        activation: str = "swish",
        batch_norm: str = "default",
        bn_momentum: float = 0.99,
        bn_epsilon: float = 1e-3,
        weight_decay: float = 5e-6,
        drop_connect_rate: float = 0.2,
        depth_divisor: int = 8,
        min_depth: Optional[int] = None,
        use_se: bool = True,
        input_channels: int = 3,
        num_classes: int = 1000,
        model_name: str = "efficientnet",
        rescale_input: bool = True,
        data_format: str = "channels_last",
        final_projection_size: int = 0,
        classifier_head: bool = True,
        dtype: Any = jnp.float32,
    ):
        for arg in locals().items():
            setattr(self, *arg)


MODEL_CONFIGS = {
    # (width, depth, resolution, dropout)
    "efficientnet-b0": ModelConfig(1.0, 1.0, 224, 0.2),
    "efficientnet-b1": ModelConfig(1.0, 1.1, 240, 0.2),
    "efficientnet-b2": ModelConfig(1.1, 1.2, 260, 0.3),
    "efficientnet-b3": ModelConfig(1.2, 1.4, 300, 0.3),
    "efficientnet-b4": ModelConfig(1.4, 1.8, 380, 0.4),
    "efficientnet-b5": ModelConfig(1.6, 2.2, 456, 0.4),
    "efficientnet-b6": ModelConfig(1.8, 2.6, 528, 0.5),
    "efficientnet-b7": ModelConfig(2.0, 3.1, 600, 0.5),
}


def round_filters(filters: int, config: ModelConfig) -> int:
    width_coefficient = config.width_coefficient
    min_depth = config.min_depth
    divisor = config.depth_divisor
    if not width_coefficient:
        return filters
    filters *= width_coefficient
    min_depth = min_depth or divisor
    new_filters = max(
        min_depth, int(filters + divisor / 2) // divisor * divisor
    )
    if new_filters < 0.9 * filters:
        new_filters += divisor
    return int(new_filters)


def round_repeats(repeats: int, depth_coefficient: float) -> int:
    return int(math.ceil(depth_coefficient * repeats))


def conv2d(
    inputs,
    num_filters,
    config,
    kernel_size=(1, 1),
    strides=(1, 1),
    use_batch_norm=True,
    use_bias=False,
    activation=None,
    depthwise=False,
    train=True,
    conv_name=None,
    bn_name=None,
    dtype=jnp.float32,
):
    conv_fn = DepthwiseConv if depthwise else nn.Conv
    kernel_size = (
        (kernel_size, kernel_size)
        if isinstance(kernel_size, int)
        else tuple(kernel_size)
    )
    x = conv_fn(
        num_filters,
        kernel_size,
        tuple(strides),
        padding="SAME",
        use_bias=use_bias,
        kernel_init=conv_kernel_init_fn,
        name=conv_name or "conv2d",
        dtype=dtype,
    )(inputs)
    # reference replaces batch norm with LayerNorm (stateless)
    x = nn.LayerNorm()(x)
    if activation is not None:
        x = getattr(nn.activation, activation.lower())(x)
    return x


def stochastic_depth(inputs, rng, survival_probability, deterministic=False):
    if survival_probability == 1.0 or deterministic:
        return inputs
    mask_shape = [inputs.shape[0]] + [1 for _ in inputs.shape[1:]]
    mask = jax.random.bernoulli(rng, p=survival_probability, shape=mask_shape)
    mask = jnp.tile(mask, [1] + list(inputs.shape[1:]))
    return jax.lax.select(
        mask, inputs / survival_probability, jnp.zeros_like(inputs)
    )


class SqueezeExcite(nn.Module):
    num_filters: int
    block: BlockConfig
    config: ModelConfig
    train: bool

    @nn.compact
    def __call__(self, inputs: jnp.ndarray) -> jnp.ndarray:
        block, config, train = self.block, self.config, self.train
        num_reduced_filters = max(1, int(block.input_filters * block.se_ratio))
        se = nn.avg_pool(inputs, inputs.shape[1:3])
        se = conv2d(
            se,
            num_reduced_filters,
            config,
            use_bias=True,
            use_batch_norm=False,
            activation=config.activation,
            conv_name="reduce_conv2d_0",
            train=train,
            dtype=config.dtype,
        )
        se = conv2d(
            se,
            self.num_filters,
            config,
            use_bias=True,
            use_batch_norm=False,
            activation="sigmoid",
            conv_name="expand_conv2d_0",
            train=train,
            dtype=config.dtype,
        )
        return inputs * se


class MBConvBlock(nn.Module):
    block: BlockConfig
    config: ModelConfig
    train: bool = False

    @nn.compact
    def __call__(self, inputs: jnp.ndarray) -> jnp.ndarray:
        config, block, train = self.config, self.block, self.train
        use_depthwise = block.conv_type != "no_depthwise"
        dtype = config.dtype
        rng = self.make_rng("drop_connect")

        filters = block.input_filters * block.expand_ratio
        x = inputs
        bn_index = 0

        if block.fused_conv:
            x = conv2d(
                x, filters, config,
                kernel_size=block.kernel_size, strides=block.strides,
                activation=config.activation, conv_name="fused_conv2d_0",
                bn_name=f"batch_normalization_{bn_index}", train=train,
                dtype=dtype,
            )
            bn_index += 1
        else:
            if block.expand_ratio != 1:
                kernel_size = (1, 1) if use_depthwise else (3, 3)
                x = conv2d(
                    x, filters, config, kernel_size=kernel_size,
                    activation=config.activation, conv_name="expand_conv2d_0",
                    bn_name=f"batch_normalization_{bn_index}", train=train,
                    dtype=dtype,
                )
                bn_index += 1
            if use_depthwise:
                x = conv2d(
                    x, num_filters=x.shape[-1], config=config,
                    kernel_size=block.kernel_size, strides=block.strides,
                    activation=config.activation, depthwise=True,
                    conv_name="depthwise_conv2d",
                    bn_name=f"batch_normalization_{bn_index}", train=train,
                    dtype=dtype,
                )
                bn_index += 1

        if config.use_se:
            assert block.se_ratio is not None and 0 < block.se_ratio <= 1
            x = SqueezeExcite(
                num_filters=filters, block=block, config=config, train=train
            )(x)

        x = conv2d(
            x, block.output_filters, config, activation=None,
            conv_name="project_conv2d_0",
            bn_name=f"batch_normalization_{bn_index}", train=train, dtype=dtype,
        )

        if (
            block.id_skip
            and all(s == 1 for s in block.strides)
            and block.input_filters == block.output_filters
        ):
            if config.drop_connect_rate and config.drop_connect_rate > 0:
                x = stochastic_depth(
                    x, rng, 1 - config.drop_connect_rate,
                    deterministic=not train,
                )
            x = x + inputs
        return x


class Stem(nn.Module):
    config: ModelConfig
    train: bool = False

    @nn.compact
    def __call__(self, inputs: jnp.ndarray) -> jnp.ndarray:
        return conv2d(
            inputs,
            round_filters(self.config.stem_base_filters, self.config),
            self.config,
            kernel_size=(3, 3),
            strides=(2, 2),
            activation=self.config.activation,
            train=self.train,
            dtype=self.config.dtype,
        )


class Head(nn.Module):
    config: Any
    train: bool = True

    @nn.compact
    def __call__(self, inputs: jnp.ndarray) -> jnp.ndarray:
        return conv2d(
            inputs,
            round_filters(self.config.top_base_filters, self.config),
            self.config,
            activation=self.config.activation,
            train=self.train,
            dtype=self.config.dtype,
        )


class EfficientNet(nn.Module):
    config: Any
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs: jnp.ndarray, *, train: bool):
        config = copy.deepcopy(self.config)
        config.dtype = self.dtype
        depth_coefficient = config.depth_coefficient
        blocks = config.blocks
        drop_connect_rate = config.drop_connect_rate

        inputs = jnp.asarray(inputs, self.dtype)
        x = Stem(config=config, train=train)(inputs)

        num_blocks_total = sum(
            round_repeats(block.num_repeat, depth_coefficient)
            for block in blocks
        )
        block_num = 0
        for block in blocks:
            assert block.num_repeat > 0
            block.input_filters = round_filters(block.input_filters, config)
            block.output_filters = round_filters(block.output_filters, config)
            block.num_repeat = round_repeats(
                block.num_repeat, depth_coefficient
            )
            config.drop_connect_rate = (
                drop_connect_rate * float(block_num) / num_blocks_total
            )
            x = MBConvBlock(block=block, config=config, train=train)(x)
            block_num += 1
            if block.num_repeat > 1:
                block.input_filters = block.output_filters
                block.strides = [1, 1]
                for _ in range(block.num_repeat - 1):
                    config.drop_connect_rate = (
                        drop_connect_rate * float(block_num) / num_blocks_total
                    )
                    x = MBConvBlock(block=block, config=config, train=train)(x)
                    block_num += 1

        return Head(self.config, train=train)(x)
