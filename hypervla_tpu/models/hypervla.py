"""HyperVLA model facade (parity: /root/reference/hypervla/model.py:25-515).

Bundles the hypernetwork + base network + params + WeightPlan metadata, and
implements:
  * from_config — fresh init with the bias-init protocol: HN output-head
    kernels start at zero and their biases are overwritten with a freshly
    initialized base net, so HN(task) == fresh base net at step 0, exactly;
  * create_tasks — one HN forward per task/episode, emitting base params;
  * sample_actions — the per-step control path (base net only), jitted;
  * save_pretrained / load_pretrained — the reference checkpoint artifact
    contract (config.json + example_batch.msgpack + dataset_statistics.json +
    orbax param step dirs).
"""
import json
import os
from functools import partial
from typing import Any, Dict, Optional

import flax
import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from flax import struct

from hypervla_tpu.models.base_network import BaseNetwork
from hypervla_tpu.models.hypernetwork import HyperNetwork, head_name_for_block
from hypervla_tpu.models.weight_plan import InitOptions, init_base_net
from hypervla_tpu.utils.static import static_dict, to_plain
from hypervla_tpu.typing import Config, Data, Params, PRNGKey


@struct.dataclass
class HyperVLA:
    hypernet: HyperNetwork = struct.field(pytree_node=False)
    base_net: nn.Module = struct.field(pytree_node=False)
    config: Config = struct.field(pytree_node=False)
    params: Params
    base_net_metadata: dict = struct.field(pytree_node=False)
    example_batch: Data = struct.field(pytree_node=False)
    dataset_statistics: Optional[Data] = struct.field(pytree_node=False)

    def create_tasks(
        self,
        goals: Optional[Data] = None,
        instruction_dict: dict = None,
        initial_state=None,
    ):
        """Builds the tasks dict and runs ONE hypernet forward to generate the
        base-net params for this episode/batch of tasks."""
        tasks = {"pad_mask_dict": {}}
        batch_size = instruction_dict["language_instruction"]["input_ids"].shape[0]
        tasks.update(
            {
                k: np.zeros((batch_size, *v.shape[1:]), dtype=v.dtype)
                for k, v in self.example_batch["task"].items()
                if k not in ("pad_mask_dict", "language_instruction")
            }
        )
        tasks["pad_mask_dict"].update(
            {
                k: np.zeros(batch_size, dtype=bool)
                for k in tasks.keys()
                if k != "pad_mask_dict"
            }
        )
        tasks["pad_mask_dict"]["language_instruction"] = np.ones(
            batch_size, dtype=bool
        )
        tasks["language_instruction"] = instruction_dict["language_instruction"]

        # the jitted generator is cached on the instance: a fresh closure per
        # call would miss jax's jit cache and re-lower/re-compile the
        # hypernet EVERY episode (seconds per call in closed-loop eval).
        # Across PROCESSES, the AOT executable cache (utils/aot.py) skips
        # trace+lower+compile entirely: a warm robot start deserializes the
        # compiled executable in milliseconds.
        _generate = self.__dict__.get("_generate_jit")
        if _generate is None:

            @jax.jit
            def _generate(params, tasks, initial_state):
                (base_params, aux), intermediates = self.hypernet.apply(
                    {"params": params},
                    tasks,
                    train=False,
                    initial_states=initial_state,
                    mutable=True,
                    capture_intermediates=True,
                )
                # squeeze the task batch dim INSIDE the program: done on the
                # host it is ~300 per-leaf eager dispatches (each a tiny
                # first-call compile — measured ~9 s of warm-start overhead)
                base_params = jax.tree_util.tree_map(
                    lambda p: p.squeeze(0), base_params
                )
                return (base_params, aux), intermediates

            from hypervla_tpu.utils import aot

            _generate = aot.load_or_compile(
                "hypernet_generate",
                _generate,
                (self.params, tasks, initial_state),
                context=json.dumps(_jsonable(self.config), sort_keys=True),
            )
            object.__setattr__(self, "_generate_jit", _generate)

        # params live as numpy on the host after from_config/load_pretrained;
        # without this once-per-process device_put every episode re-uploads
        # the full hypernet (~345 MB) — measured 7-13 s through the shared-
        # chip tunnel vs 57 ms with device-resident weights
        dev = self.__dict__.get("_params_on_device")
        if dev is None or dev[0] is not self.params:
            dev = (self.params, jax.device_put(self.params))
            object.__setattr__(self, "_params_on_device", dev)

        (dict_base_params, _), intermediate_states = _generate(
            dev[1], tasks, initial_state
        )
        return dict_base_params, tasks, intermediate_states

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
        """Runs only the (generated) base network — the per-step hot path."""
        images = images.squeeze(1)
        if self.config["base_net_kwargs"]["vit_kwargs"].get(
            "image_embedding_noise", 0.0
        ) > 0.0:
            dropout_rng, embedding_noise_rng = jax.random.split(rng)
            rngs = {"dropout": dropout_rng, "embedding_noise": embedding_noise_rng}
        else:
            rngs = {"dropout": rng}

        action, intermediate_states = self.base_net.apply(
            {"params": base_params},
            images,
            instruction_dict["language_instruction"]["token_embedding"],
            timestep_pad_mask,
            rng=rng,
            rngs=rngs,
            train=train,
            image_embeddings=image_embeddings,
            method=BaseNetwork.predict_action,
            mutable=["intermediates"],
        )
        return action, intermediate_states

    @classmethod
    def from_config(
        cls,
        config: Config,
        example_batch: Data,
        rng: Optional[PRNGKey] = None,
        dataset_statistics: Optional[Data] = None,
        verbose: bool = False,
    ):
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        hypernet_rng, base_net_rng = jax.random.split(rng)
        example_batch = jax.tree_util.tree_map(
            lambda x: np.asarray(x)[:1], example_batch
        )

        base_net, init_base_params, flat_init_base_params, metadata = init_base_net(
            config, example_batch, base_net_rng, verbose=verbose
        )
        hypernet = HyperNetwork(metadata, config["hypernet_kwargs"])

        @jax.jit
        def _init(rng):
            dropout_rng, rng = jax.random.split(rng)
            if config["hypernet_kwargs"].get("use_initial_image", False):
                initial_states = example_batch["initial_state"]
            else:
                initial_states = None
            return hypernet.init(
                {"params": rng, "dropout": dropout_rng},
                example_batch["task"],
                train=True,
                initial_states=initial_states,
            )

        # keep freshly-initialized leaves ON DEVICE: the bias-init protocol
        # below overwrites the bulk of them (shared-module weights + output-
        # head biases) with raveled init_base_params leaves — also device-
        # resident — so a ~350 MB device->host download here is waste
        # (measured ~35 s through the shared-chip tunnel). Consumers
        # device_put/shard the tree; load_pretrained still yields numpy.
        params = flax.core.unfreeze(_init(hypernet_rng)["params"])

        generation_strategy = config["hypernet_kwargs"].get(
            "generation_strategy", "full"
        )
        share_tf = config["hypernet_kwargs"].get("share_TF_output_head", False)
        # ravel every init leaf in ONE device program: per-leaf np.ravel on
        # device arrays is a download (or an eager dispatch) per leaf —
        # ~300 tunnel round trips
        raveled_init = jax.jit(
            lambda t: jax.tree_util.tree_map(jnp.ravel, t)
        )(init_base_params)
        if generation_strategy == "block":

            def bias_init(path, value, generation_flag):
                path_str = "_".join(x.key for x in path)
                head_name = head_name_for_block(path_str, share_tf)
                if (
                    metadata["output_head_info"][head_name]["init_strategy"]
                    == InitOptions.VARIANCE_INIT
                ):
                    return
                if generation_flag:
                    if share_tf and "encoderblock_" in path_str:
                        if "encoderblock_0" not in path_str:
                            return  # only layer 0 seeds the shared head
                    params[f"output_head_{head_name}"]["bias"] = value
                else:
                    params[path_str] = value

            jax.tree_util.tree_map_with_path(
                bias_init, raveled_init, metadata["generation_flag"]
            )
        else:
            if config["hypernet_kwargs"].get("output_head_bias", True):
                params["output_head"]["bias"] = flat_init_base_params
            else:
                rngs = jax.random.split(
                    rng, params["output_head"]["kernel"].shape[0]
                )
                init_rows = []
                for row_rng in rngs:
                    _, _, flat, _ = init_base_net(config, example_batch, row_rng)
                    init_rows.append(flat)
                params["output_head"]["kernel"] = np.stack(init_rows)
            # shared blocks still bias-init from the fresh base net
            def shared_init(path, value, generation_flag):
                if not generation_flag:
                    params["_".join(x.key for x in path)] = value

            jax.tree_util.tree_map_with_path(
                shared_init, raveled_init, metadata["generation_flag"]
            )

        return cls(
            hypernet=hypernet,
            base_net=base_net,
            params=params,
            base_net_metadata=metadata,
            example_batch=static_dict(example_batch),
            config=config,
            dataset_statistics=static_dict(dataset_statistics),
        )

    # ------------------------- checkpoint contract -------------------------

    def save_pretrained(
        self,
        step: int,
        checkpoint_path: Optional[str] = None,
        checkpoint_manager=None,
    ):
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

        checkpoint_manager.save(
            step, args=ocp.args.PyTreeSave(self.params)
        )
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
            stats_path = os.path.join(checkpoint_path, "dataset_statistics.json")
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
        if "action_head_kwargs" not in config["base_net_kwargs"]:
            config["base_net_kwargs"]["action_head_kwargs"] = dict(
                token_per_horizon=False,
                squash_continuous_action=True,
                clip_target=False,
                max_action=5.0,
            )

        with open(os.path.join(checkpoint_path, "example_batch.msgpack"), "rb") as f:
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

        rng = jax.random.PRNGKey(0)
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

        base_net, _, _, metadata = init_base_net(config, example_batch, rng)
        hypernet = HyperNetwork(metadata, config["hypernet_kwargs"])

        if config["hypernet_kwargs"].get("use_initial_image", False):
            initial_states = example_batch["initial_state"]
        else:
            initial_states = None
        params_shape = jax.eval_shape(
            partial(hypernet.init, train=False),
            jax.random.PRNGKey(0),
            example_batch["task"],
            initial_states=initial_states,
        )["params"]

        mngr = ocp.CheckpointManager(checkpoint_path)
        step = step if step is not None else mngr.latest_step()
        restore_args = jax.tree_util.tree_map(
            lambda s: ocp.RestoreArgs(restore_type=np.ndarray), params_shape
        )
        params = mngr.restore(
            step, args=ocp.args.PyTreeRestore(restore_args=restore_args)
        )
        return cls(
            hypernet=hypernet,
            base_net=base_net,
            params=params,
            base_net_metadata=metadata,
            example_batch=static_dict(example_batch),
            config=config,
            dataset_statistics=static_dict(dataset_statistics),
        )


def _jsonable(obj):
    """Converts a config tree into JSON-serializable builtins."""
    if isinstance(obj, dict):
        return {k: _jsonable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_jsonable(v) for v in obj]
    if isinstance(obj, (np.integer,)):
        return int(obj)
    if isinstance(obj, (np.floating,)):
        return float(obj)
    if isinstance(obj, np.ndarray):
        return obj.tolist()
    return obj
