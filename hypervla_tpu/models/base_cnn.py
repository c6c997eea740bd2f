"""Minimal conv+MLP policy — the non-transformer ablation baseline.

Capability parity with hypervla/components/base_cnn.py: a four-stage
weight-standardized conv stack over a normalized image, flattened into a
small relu MLP that regresses the action vector.
"""
import flax.linen as nn

from hypervla_tpu.models.vit_encoders import StdConv, normalize_images


class CNN(nn.Module):
    """Conv stack + MLP mapping an image to a flat action vector."""

    output_dim: int = 4
    features: tuple = (32, 64, 128, 256)
    kernel_sizes: tuple = (3, 3, 3, 3)
    strides: tuple = (2, 2, 2, 2)
    padding: tuple = (1, 1, 1, 1)
    mlp_hidden_sizes: tuple = (32, 32)

    def _stage(self, h, spec):
        k, s, f, p = spec
        h = StdConv(
            features=f, kernel_size=(k, k), strides=(s, s), padding=p
        )(h)
        return nn.relu(nn.GroupNorm()(h))

    @nn.compact
    def __call__(self, x):
        h = normalize_images(x, "default")
        stage_specs = zip(self.kernel_sizes, self.strides, self.features,
                          self.padding)
        for spec in stage_specs:
            h = self._stage(h, spec)
        h = h.reshape(h.shape[0], -1)
        for width in self.mlp_hidden_sizes:
            h = nn.relu(nn.Dense(width)(h))
        return nn.Dense(self.output_dim)(h)
