"""Feature-wise linear modulation (FiLM).

Capability parity with octo/model/components/film_conditioning_layer.py:
modulates a conv feature map with two zero-initialized projections of a
conditioning vector, so the layer starts as identity. (The two projections
keep separate Dense submodules — Dense_0 / Dense_1 — for 1:1 checkpoint
mapping with the reference.)
"""
import flax.linen as nn
import jax


class FilmConditioning(nn.Module):
    """x -> x * (1 + scale(z)) + shift(z) over the channel axis."""

    @nn.compact
    def __call__(self, conv_filters: jax.Array, conditioning: jax.Array):
        channels = conv_filters.shape[-1]
        zeros = nn.initializers.zeros
        # creation order matches the reference: Dense_0 is the
        # multiplicative term, Dense_1 the additive one
        scale, shift = (
            nn.Dense(channels, kernel_init=zeros, bias_init=zeros)(
                conditioning
            )[:, None, None]
            for _ in range(2)
        )
        return conv_filters * (1 + scale) + shift
