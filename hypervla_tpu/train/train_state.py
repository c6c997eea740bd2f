"""TrainState for the single-jit GSPMD training program.

Unlike the reference (pmap + flax replicate + a pickle EMA side-channel,
scripts/train.py:323-324,618-690), the state here is one sharded pytree that
lives on the mesh and is donated through the jitted step: params, optimizer
state, rng, step counter, and the EMA params tracked *inside* the step.
"""
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from hypervla_tpu.typing import Params, PRNGKey


@struct.dataclass
class TrainState:
    step: jax.Array
    params: Params
    opt_state: Any
    rng: PRNGKey
    ema_params: Optional[Params] = None

    @classmethod
    def create(
        cls,
        rng: PRNGKey,
        params: Params,
        tx: optax.GradientTransformation,
        track_ema: bool = False,
    ) -> "TrainState":
        # one batched transfer for any host leaves (per-leaf jnp.asarray is
        # an eager dispatch each — a host round trip per leaf on remote TPUs)
        params = jax.device_put(params)
        opt_state = tx.init(params)
        # EMA must be a REAL copy: params may already be device arrays (e.g.
        # out of HyperVLA.from_config), where jnp.asarray is identity — the
        # ema and params leaves would then share buffers and donating the
        # state fails with "attempt to donate the same buffer twice"
        ema = (
            jax.jit(lambda t: jax.tree_util.tree_map(jnp.copy, t))(params)
            if track_ema
            else None
        )
        return cls(
            step=jnp.zeros((), dtype=jnp.int32),
            params=params,
            opt_state=opt_state,
            rng=rng,
            ema_params=ema,
        )
