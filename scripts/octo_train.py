"""Original-Octo pretraining driver (parity: scripts/octo_train.py).

The reference's octo_train was the only GSPMD path in the codebase; here the
main trainer is already GSPMD, so this script simply trains an OctoModel
(observation tokenizers + diffusion head) over the same mesh machinery.
"""
import logging

import jax
import jax.numpy as jnp
import numpy as np
import optax
from absl import app, flags
from ml_collections import config_flags

FLAGS = flags.FLAGS
flags.DEFINE_string("name", "octo", "Experiment name.")
flags.DEFINE_string("save_dir", None, "Checkpoint directory.")

config_flags.DEFINE_config_file(
    "config",
    "scripts/configs/octo_pretrain_config.py:vit_s,oxe",
    "Training configuration.",
    lock_config=False,
)


def main(_):
    logging.getLogger().setLevel(logging.INFO)
    config = FLAGS.config.to_dict()

    from hypervla_tpu.models.octo_model import OctoModel
    from hypervla_tpu.parallel.mesh import create_mesh, replicated, shard_batch
    from hypervla_tpu.train.optimizer import create_lr_schedule
    from hypervla_tpu.train.trainer import make_process_batch, make_train_datasets

    dataset = make_train_datasets(config)
    process_batch = make_process_batch(config)
    data_iter = map(process_batch, iter(dataset.prefetch(2)))
    example_batch = next(data_iter)
    example_batch["task"].pop("instruction_string", None)
    example_batch.pop("dataset_name", None)

    model = OctoModel.from_config(
        config, example_batch, rng=jax.random.PRNGKey(config.get("seed", 0)),
        dataset_statistics=getattr(dataset, "dataset_statistics", None),
    )

    lr = create_lr_schedule(**config["optimizer"]["learning_rate"])
    tx = optax.chain(
        optax.clip_by_global_norm(config["optimizer"].get("clip_gradient", 1.0)),
        optax.adamw(lr, weight_decay=config["optimizer"].get("weight_decay",
                                                             0.1)),
    )
    opt_state = tx.init(model.params)
    mesh = create_mesh()
    params = jax.device_put(model.params, replicated(mesh))
    opt_state = jax.device_put(opt_state, replicated(mesh))

    def loss_fn(params, batch, rng):
        bound = model.module.bind({"params": params},
                                  rngs={"dropout": rng})
        transformer_outputs = bound.octo_transformer(
            batch["observation"], batch["task"],
            batch["observation"]["timestep_pad_mask"], train=True,
        )
        head = bound.heads["action"]
        loss, metrics = head.loss(
            transformer_outputs,
            batch["action"],
            batch["observation"]["timestep_pad_mask"],
            batch["action_pad_mask"],
            train=True,
        )
        return loss, metrics

    @jax.jit
    def train_step(params, opt_state, batch, rng):
        rng, dropout_rng = jax.random.split(rng)
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, dropout_rng
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, rng, loss

    rng = jax.random.PRNGKey(config.get("seed", 0))
    for step in range(config["num_steps"]):
        batch = next(data_iter)
        batch["task"].pop("instruction_string", None)
        batch.pop("dataset_name", None)
        batch = shard_batch(batch, mesh)
        params, opt_state, rng, loss = train_step(params, opt_state, batch, rng)
        if (step + 1) % config.get("log_interval", 100) == 0:
            logging.info(f"step {step + 1}: loss={float(loss):.4f}")
        if FLAGS.save_dir and (step + 1) % config.get("save_interval",
                                                      10000) == 0:
            model.replace(params=jax.device_get(params)).save_pretrained(
                step=step + 1, checkpoint_path=FLAGS.save_dir
            )


if __name__ == "__main__":
    app.run(main)
