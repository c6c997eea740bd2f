"""BaseModel: the no-hypernetwork ablation (parity: hypervla/base_model.py).

Trains the tiny base network directly; keeps the same create_tasks /
sample_actions / checkpoint interface as HyperVLA so the trainer and the
InferenceWrapper work unchanged (create_tasks simply returns the learned
params).
"""
import json
import os
from typing import Optional

import flax
import jax
import numpy as np
from flax import linen as nn
from flax import struct

from hypervla_tpu.models.base_network import BaseNetwork
from hypervla_tpu.models.hypervla import _jsonable
from hypervla_tpu.utils.static import static_dict, to_plain
from hypervla_tpu.typing import Config, Data, Params, PRNGKey


@struct.dataclass
class BaseModel:
    base_net: nn.Module = struct.field(pytree_node=False)
    config: Config = struct.field(pytree_node=False)
    params: Params
    example_batch: Data = struct.field(pytree_node=False)
    dataset_statistics: Optional[Data] = struct.field(pytree_node=False)

    def create_tasks(
        self,
        goals: Optional[Data] = None,
        instruction_dict: dict = None,
        initial_state=None,
    ):
        return self.params, None, None

    @jax.jit
    def sample_actions(
        self,
        images,
        instruction_dict,
        task,
        timestep_pad_mask,
        base_params,
        train: bool = False,
        rng: Optional[PRNGKey] = None,
        image_embeddings=None,
    ):
        action = self.base_net.apply(
            {"params": base_params},
            images,
            instruction_dict["language_instruction"]["token_embedding"],
            timestep_pad_mask,
            rng=rng,
            rngs={"dropout": rng},
            train=train,
            image_embeddings=image_embeddings,
            method=BaseNetwork.predict_action,
        )
        return action, None

    @classmethod
    def from_config(
        cls,
        config: Config,
        example_batch: Data,
        rng: Optional[PRNGKey] = None,
        dataset_statistics: Optional[Data] = None,
    ):
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        example_batch = jax.tree_util.tree_map(
            lambda x: np.asarray(x)[:1], example_batch
        )
        from hypervla_tpu.models.weight_plan import init_base_net

        base_net, init_base_params, _, _ = init_base_net(
            config, example_batch, rng
        )
        return cls(
            base_net=base_net,
            params=init_base_params,
            example_batch=static_dict(example_batch),
            config=config,
            dataset_statistics=static_dict(dataset_statistics),
        )

    def save_pretrained(self, step: int, checkpoint_path: Optional[str] = None,
                        checkpoint_manager=None):
        import orbax.checkpoint as ocp

        if (checkpoint_path is None) == (checkpoint_manager is None):
            raise ValueError(
                "Provide exactly one of checkpoint_path or checkpoint_manager."
            )
        if checkpoint_manager is None:
            checkpoint_manager = ocp.CheckpointManager(
                os.path.abspath(checkpoint_path)
            )
        if checkpoint_path is None:
            checkpoint_path = str(checkpoint_manager.directory)
        checkpoint_manager.save(step, args=ocp.args.PyTreeSave(self.params))
        checkpoint_manager.wait_until_finished()

        if jax.process_index() == 0:
            os.makedirs(checkpoint_path, exist_ok=True)
            config_path = os.path.join(checkpoint_path, "config.json")
            if not os.path.exists(config_path):
                with open(config_path, "w") as f:
                    json.dump(_jsonable(self.config), f)
            example_batch_path = os.path.join(
                checkpoint_path, "example_batch.msgpack"
            )
            if not os.path.exists(example_batch_path):
                with open(example_batch_path, "wb") as f:
                    f.write(
                        flax.serialization.msgpack_serialize(
                            to_plain(
                                jax.tree_util.tree_map(
                                    np.asarray, self.example_batch
                                )
                            )
                        )
                    )
            stats_path = os.path.join(
                checkpoint_path, "dataset_statistics.json"
            )
            if not os.path.exists(stats_path) and self.dataset_statistics is not None:
                with open(stats_path, "w") as f:
                    json.dump(
                        to_plain(
                            jax.tree_util.tree_map(
                                lambda x: np.asarray(x).tolist(),
                                self.dataset_statistics,
                            )
                        ),
                        f,
                    )

    @classmethod
    def load_pretrained(cls, checkpoint_path: str, step: Optional[int] = None):
        import orbax.checkpoint as ocp

        checkpoint_path = os.path.abspath(checkpoint_path)
        with open(os.path.join(checkpoint_path, "config.json")) as f:
            config = json.load(f)
        with open(
            os.path.join(checkpoint_path, "example_batch.msgpack"), "rb"
        ) as f:
            example_batch = flax.serialization.msgpack_restore(f.read())
        stats_path = os.path.join(checkpoint_path, "dataset_statistics.json")
        dataset_statistics = None
        if os.path.exists(stats_path):
            with open(stats_path) as f:
                dataset_statistics = json.load(f)
            dataset_statistics = jax.tree_util.tree_map(
                np.array, dataset_statistics,
                is_leaf=lambda x: not isinstance(x, dict),
            )

        if "token_embedding" not in example_batch["task"]["language_instruction"]:
            example_batch["task"]["language_instruction"]["token_embedding"] = (
                np.zeros(
                    (
                        *example_batch["task"]["language_instruction"][
                            "input_ids"
                        ].shape,
                        768,
                    )
                )
            )

        from hypervla_tpu.models.weight_plan import init_base_net

        base_net, init_params, _, _ = init_base_net(
            config, example_batch, jax.random.PRNGKey(0)
        )
        params_shape = jax.eval_shape(lambda: init_params)

        mngr = ocp.CheckpointManager(checkpoint_path)
        step = step if step is not None else mngr.latest_step()
        restore_args = jax.tree_util.tree_map(
            lambda s: ocp.RestoreArgs(restore_type=np.ndarray), params_shape
        )
        params = mngr.restore(
            step, args=ocp.args.PyTreeRestore(restore_args=restore_args)
        )
        return cls(
            base_net=base_net,
            params=params,
            example_batch=static_dict(example_batch),
            config=config,
            dataset_statistics=static_dict(dataset_statistics),
        )
