"""Original-Octo pretraining driver (parity: scripts/octo_train.py).

The reference's octo_train was the only GSPMD path in the codebase; here the
main trainer is already GSPMD, so this script simply trains an OctoModel
(observation tokenizers + diffusion head) over the same mesh machinery.
"""
import logging

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


def run(config, save_dir=None, num_steps=None, dataset=None):
    """Trains an OctoModel; returns (model, final params on host)."""
    import jax
    import optax

    import jax.numpy as jnp

    from hypervla_tpu.models.octo_model import OctoModel
    from hypervla_tpu.parallel.mesh import create_mesh, replicated, shard_batch
    from hypervla_tpu.train.optimizer import create_lr_schedule
    from hypervla_tpu.train.trainer import (
        build_frozen_encoders,
        make_process_batch,
        make_train_datasets,
    )

    num_steps = num_steps if num_steps is not None else config["num_steps"]
    if dataset is None:
        dataset = make_train_datasets(config)
    process_batch = make_process_batch(config)
    # instructions are embedded by the frozen T5 inside the jitted step, with
    # the T5 weights passed as arguments (NOT closure constants — those get
    # baked into the HLO and blow up the serialized program)
    text_apply, _, t5_params, _ = build_frozen_encoders(config)

    def _embed_task(task, t5_params):
        instr = dict(task["language_instruction"])
        instr["token_embedding"] = jax.lax.stop_gradient(
            text_apply(t5_params, instr["input_ids"], instr["attention_mask"])
        )
        task = dict(task, language_instruction=instr)
        if "pad_mask_dict" not in task:
            task["pad_mask_dict"] = {
                "language_instruction": jnp.ones(
                    instr["input_ids"].shape[0], bool
                )
            }
        return task

    data_iter = map(process_batch, iter(dataset.prefetch(2)))
    example_batch = next(data_iter)
    example_batch["task"].pop("instruction_string", None)
    example_batch.pop("dataset_name", None)
    example_batch["task"] = jax.device_get(
        jax.jit(_embed_task)(example_batch["task"], t5_params)
    )

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

    def loss_fn(params, batch, rng, t5_params):
        task = _embed_task(batch["task"], t5_params)
        bound = model.module.bind({"params": params},
                                  rngs={"dropout": rng})
        transformer_outputs = bound.octo_transformer(
            batch["observation"], task,
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
    def train_step(params, opt_state, batch, rng, t5_params):
        rng, dropout_rng = jax.random.split(rng)
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, dropout_rng, t5_params
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, rng, loss

    t5_params = jax.device_put(t5_params, replicated(mesh))
    rng = jax.random.PRNGKey(config.get("seed", 0))
    loss = None
    for step in range(num_steps):
        batch = next(data_iter)
        batch["task"].pop("instruction_string", None)
        batch.pop("dataset_name", None)
        batch = shard_batch(batch, mesh)
        params, opt_state, rng, loss = train_step(
            params, opt_state, batch, rng, t5_params
        )
        if (step + 1) % config.get("log_interval", 100) == 0:
            logging.info(f"step {step + 1}: loss={float(loss):.4f}")
        if save_dir and (step + 1) % config.get("save_interval", 10000) == 0:
            model.replace(params=jax.device_get(params)).save_pretrained(
                step=step + 1, checkpoint_path=save_dir
            )
    return model, jax.device_get(params)


def main(_):
    logging.getLogger().setLevel(logging.INFO)
    run(FLAGS.config.to_dict(), save_dir=FLAGS.save_dir)


if __name__ == "__main__":
    app.run(main)
