"""FiLM conditioning (parity: octo/model/components/film_conditioning_layer.py:8-33)."""
import flax.linen as nn
import jax


class FilmConditioning(nn.Module):
    """Feature-wise linear modulation of a conv feature map by a conditioning
    vector: x * (1 + mul(z)) + add(z), with zero-initialized projections so the
    layer starts as identity."""

    @nn.compact
    def __call__(self, conv_filters: jax.Array, conditioning: jax.Array):
        projected_cond_add = nn.Dense(
            features=conv_filters.shape[-1],
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
        )(conditioning)
        projected_cond_mul = nn.Dense(
            features=conv_filters.shape[-1],
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
        )(conditioning)
        projected_cond_add = projected_cond_add[:, None, None]
        projected_cond_mul = projected_cond_mul[:, None, None]
        return conv_filters * (1 + projected_cond_mul) + projected_cond_add
