"""HyperVLA pretraining / finetuning CLI.

Parity with the reference entry point:
    python -m scripts.train \
        --config scripts/configs/hypervla_pretrain_config.py:vit_t,oxe \
        --config.dataset_kwargs.batch_size=256 ...

All config fields are overridable from the command line via ml_collections
config_flags. Runs the GSPMD trainer (hypervla_tpu.train.trainer).
"""
import logging

from absl import app, flags
from ml_collections import config_flags

FLAGS = flags.FLAGS

flags.DEFINE_string("name", "hypervla", "Experiment name.")
flags.DEFINE_string("save_dir", None, "Checkpoint directory.")
flags.DEFINE_integer("fsdp", 1, "FSDP axis size of the device mesh.")
flags.DEFINE_integer("tp", 1, "Tensor-parallel (model) axis size.")
flags.DEFINE_bool("wandb", False, "Enable wandb logging.")
flags.DEFINE_string("wandb_project", "hypervla_tpu", "wandb project.")
flags.DEFINE_string(
    "wandb_resume_id", None,
    "Resume an existing wandb run (parity: the reference's wandb_resume_id; "
    "TrainState resume itself is driven by --save_dir/state/latest.pkl).",
)

config_flags.DEFINE_config_file(
    "config",
    "scripts/configs/hypervla_pretrain_config.py:vit_t,oxe",
    "Training configuration.",
    lock_config=False,
)


def main(_):
    logging.getLogger().setLevel(logging.INFO)
    config = FLAGS.config.to_dict()

    wandb_run = None
    if FLAGS.wandb:
        try:
            import wandb

            wandb_run = wandb.init(
                project=FLAGS.wandb_project,
                name=FLAGS.name,
                config=config,
                id=FLAGS.wandb_resume_id,
                resume="must" if FLAGS.wandb_resume_id else None,
            )
        except Exception as e:
            logging.warning(f"wandb unavailable ({e}); continuing without it.")

    from hypervla_tpu.train.trainer import train

    train(
        config,
        save_dir=FLAGS.save_dir,
        wandb_run=wandb_run,
        fsdp=FLAGS.fsdp,
        tp=FLAGS.tp,
    )


if __name__ == "__main__":
    app.run(main)
