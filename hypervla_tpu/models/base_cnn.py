"""Minimal conv+MLP policy, ablation baseline (parity: hypervla/components/base_cnn.py)."""
import flax.linen as nn

from hypervla_tpu.models.vit_encoders import StdConv, normalize_images


class CNN(nn.Module):
    """Conv stack + MLP mapping an image to a flat action vector."""

    kernel_sizes: tuple = (3, 3, 3, 3)
    strides: tuple = (2, 2, 2, 2)
    features: tuple = (32, 64, 128, 256)
    padding: tuple = (1, 1, 1, 1)
    mlp_hidden_sizes: tuple = (32, 32)
    output_dim: int = 4

    @nn.compact
    def __call__(self, x):
        x = normalize_images(x, "default")
        for kernel_size, stride, features, padding in zip(
            self.kernel_sizes, self.strides, self.features, self.padding
        ):
            x = StdConv(
                features=features,
                kernel_size=(kernel_size, kernel_size),
                strides=(stride, stride),
                padding=padding,
            )(x)
            x = nn.GroupNorm()(x)
            x = nn.relu(x)
        x = x.reshape((x.shape[0], -1))
        for hidden_size in self.mlp_hidden_sizes:
            x = nn.Dense(hidden_size)(x)
            x = nn.relu(x)
        return nn.Dense(self.output_dim)(x)
