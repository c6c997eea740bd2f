"""hypervla_tpu — a TPU-native Vision-Language-Action framework.

A ground-up JAX/XLA/Pallas/GSPMD re-design with the capabilities of the
HyperVLA reference system (see /root/reference): a hypernetwork consumes a
language instruction (plus optionally the episode's initial image) and emits
the weights of a tiny per-task base policy network, which is then the only
thing that runs per control step.

Layout:
    models/    flax modules: transformer, encoders, action heads, hypernet,
               the HyperVLA model facade, weight-plan metadata machinery
    ops/       Pallas TPU kernels + fused compute paths
    parallel/  mesh construction and GSPMD sharding rules
    data/      TPU-friendly input pipeline (RLDS-compatible, no tf.data)
    train/     optimizer, train state, single-jit GSPMD train step, EMA
    eval/      closed-loop inference runtime, action ensembling, sim drivers
    utils/     ModuleSpec, config system, timers, checkpoint helpers
"""

__version__ = "0.1.0"
