"""OctoModel: the original Octo inference/training facade.

Parity: octo/model/octo_model.py — kept functional for baseline runs
(scripts/octo_train.py equivalent). One TPU-native delta: instructions are
embedded by the native T5 encoder at `create_tasks` time (the reference
tokenizes in-model through a HF submodule), matching how the HyperVLA eval
path feeds precomputed token embeddings.
"""
import json
import os
from functools import partial
from typing import Any, Optional, Sequence, Tuple

import flax
import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax.typing import ArrayLike

from hypervla_tpu.data.data_utils import NormalizationType
from hypervla_tpu.models.base_octo import OctoModule
from hypervla_tpu.models.hypervla import _jsonable
from hypervla_tpu.utils.static import static_dict, to_plain
from hypervla_tpu.typing import Config, Data, Params, PRNGKey
from hypervla_tpu.utils.spec import ModuleSpec


@struct.dataclass
class OctoModel:
    module: OctoModule = struct.field(pytree_node=False)
    text_processor: Any = struct.field(pytree_node=False)
    config: Config = struct.field(pytree_node=False)
    params: Params
    example_batch: Data = struct.field(pytree_node=False)
    dataset_statistics: Optional[Data] = struct.field(pytree_node=False)
    text_embed_fn: Any = struct.field(pytree_node=False, default=None)

    def create_tasks(
        self, goals: Optional[Data] = None,
        texts: Optional[Sequence[str]] = None,
    ):
        """Creates a tasks dict from goal images and/or texts."""
        assert goals is not None or texts is not None
        tasks = {"pad_mask_dict": {}}
        if goals is not None:
            tasks.update(goals)
            tasks["pad_mask_dict"].update(
                {k: np.ones(v.shape[:1], dtype=bool) for k, v in goals.items()}
            )
        else:
            batch_size = len(texts)
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

        if texts is not None:
            tasks["pad_mask_dict"]["language_instruction"] = np.ones(
                len(texts), dtype=bool
            )
        else:
            batch_size = jax.tree_util.tree_leaves(goals)[0].shape[0]
            texts = [""] * batch_size
            tasks["pad_mask_dict"]["language_instruction"] = np.zeros(
                batch_size, dtype=bool
            )

        assert self.text_processor is not None, "need a text processor"
        tokens = self.text_processor.encode(texts)
        instruction = dict(tokens)
        if self.text_embed_fn is not None:
            instruction["token_embedding"] = np.asarray(
                self.text_embed_fn(
                    tokens["input_ids"], tokens["attention_mask"]
                )
            )
        tasks["language_instruction"] = instruction
        return tasks

    @partial(jax.jit, static_argnames=("train",))
    def run_transformer(
        self, observations: Data, tasks: Data, timestep_pad_mask: ArrayLike,
        train: bool = False,
    ):
        _verify_shapes(
            observations, "observations", self.example_batch["observation"],
            starting_dim=2,
        )
        return self.module.apply(
            {"params": self.params},
            observations,
            tasks,
            timestep_pad_mask,
            train=train,
            method="octo_transformer",
        )

    @partial(jax.jit, static_argnames=("train", "sample_shape", "argmax"))
    def sample_actions(
        self,
        observations: Data,
        tasks: Data,
        unnormalization_statistics: Optional[Data] = None,
        normalization_type: NormalizationType = NormalizationType.NORMAL,
        timestep_pad_mask: Optional[ArrayLike] = None,
        train: bool = False,
        argmax: bool = False,
        sample_shape: Tuple[int, ...] = (),
        rng: Optional[PRNGKey] = None,
        temperature: float = 1.0,
    ):
        """Samples (optionally unnormalized) actions for the final window step."""
        if timestep_pad_mask is None:
            timestep_pad_mask = observations["timestep_pad_mask"]

        transformer_outputs = self.run_transformer(
            observations, tasks, timestep_pad_mask, train=train
        )
        action_head = self.module.bind({"params": self.params}).heads["action"]
        action = action_head.predict_action(
            transformer_outputs,
            train=train,
            argmax=argmax,
            sample_shape=sample_shape,
            rng=rng,
            temperature=temperature,
            embodiment_action_dim=(
                len(unnormalization_statistics["mean"])
                if unnormalization_statistics is not None
                else None
            ),
        )
        if unnormalization_statistics is not None:
            if normalization_type == NormalizationType.NORMAL:
                mask = unnormalization_statistics.get(
                    "mask",
                    jnp.ones_like(
                        unnormalization_statistics["mean"], dtype=bool
                    ),
                )
                action = action[..., : len(mask)]
                action = jnp.where(
                    mask,
                    action * unnormalization_statistics["std"]
                    + unnormalization_statistics["mean"],
                    action,
                )
            elif normalization_type == NormalizationType.BOUNDS:
                mask = unnormalization_statistics.get(
                    "mask",
                    jnp.ones_like(unnormalization_statistics["p01"], dtype=bool),
                )
                action = action[..., : len(mask)]
                action = jnp.where(
                    mask,
                    (action + 1)
                    * (
                        unnormalization_statistics["p99"]
                        - unnormalization_statistics["p01"]
                    )
                    / 2
                    + unnormalization_statistics["p01"],
                    action,
                )
            else:
                raise ValueError(
                    f"Unknown normalization type: {normalization_type}"
                )
        return action

    @classmethod
    def from_config(
        cls,
        config: Config,
        example_batch: Data,
        text_processor: Optional[Any] = None,
        verbose: bool = False,
        rng: Optional[PRNGKey] = None,
        dataset_statistics: Optional[Data] = None,
        text_embed_fn: Optional[Any] = None,
    ):
        module = OctoModule.create(**config["model"])
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        example_batch = jax.tree_util.tree_map(
            lambda x: np.asarray(x)[:1], example_batch
        )
        init_args = (
            example_batch["observation"],
            example_batch["task"],
            example_batch["observation"]["timestep_pad_mask"],
        )

        @jax.jit
        def _init(rng):
            return module.init(rng, *init_args, train=False)

        params = _init(rng)["params"]
        return cls(
            module=module,
            params=params,
            text_processor=text_processor,
            example_batch=static_dict(example_batch),
            config=config,
            dataset_statistics=static_dict(dataset_statistics),
            text_embed_fn=text_embed_fn,
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
            batch_path = os.path.join(checkpoint_path, "example_batch.msgpack")
            if not os.path.exists(batch_path):
                with open(batch_path, "wb") as f:
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
    def load_pretrained(cls, checkpoint_path: str,
                        step: Optional[int] = None) -> "OctoModel":
        """Load a `save_pretrained` checkpoint from a directory or an
        `hf://org/repo` HuggingFace reference (parity:
        octo/model/octo_model.py:266-273 + _download_from_huggingface).
        Hub refs resolve through the local HF cache first, so an
        egress-less host works with a pre-populated cache
        (HF_HUB_CACHE / ~/.cache/huggingface)."""
        import orbax.checkpoint as ocp

        if checkpoint_path.startswith("hf://"):
            if step is not None:
                raise ValueError(
                    "step cannot be set when loading from HuggingFace; "
                    "hub snapshots pin their own revision"
                )
            checkpoint_path = _resolve_hf_checkpoint(
                checkpoint_path.removeprefix("hf://")
            )
        checkpoint_path = os.path.abspath(checkpoint_path)
        with open(os.path.join(checkpoint_path, "config.json")) as f:
            config = json.load(f)
        with open(
            os.path.join(checkpoint_path, "example_batch.msgpack"), "rb"
        ) as f:
            example_batch = flax.serialization.msgpack_restore(f.read())
        if "tasks" in example_batch:
            example_batch["task"] = example_batch.pop("tasks")
        if "timestep_pad_mask" not in example_batch["observation"]:
            example_batch["observation"]["timestep_pad_mask"] = example_batch[
                "observation"
            ]["pad_mask"]

        stats_path = os.path.join(checkpoint_path, "dataset_statistics.json")
        dataset_statistics = None
        if os.path.exists(stats_path):
            with open(stats_path) as f:
                dataset_statistics = json.load(f)
            dataset_statistics = jax.tree_util.tree_map(
                np.array, dataset_statistics,
                is_leaf=lambda x: not isinstance(x, dict),
            )

        module = OctoModule.create(**config["model"])
        init_args = (
            example_batch["observation"],
            example_batch["task"],
            example_batch["observation"]["timestep_pad_mask"],
        )
        params_shape = jax.eval_shape(
            partial(module.init, train=False), jax.random.PRNGKey(0), *init_args
        )["params"]
        mngr = ocp.CheckpointManager(checkpoint_path)
        step = step if step is not None else mngr.latest_step()
        restore_args = jax.tree_util.tree_map(
            lambda s: ocp.RestoreArgs(restore_type=np.ndarray), params_shape
        )
        params = mngr.restore(
            step, args=ocp.args.PyTreeRestore(restore_args=restore_args)
        )

        text_processor = None
        if config.get("text_processor") is not None:
            text_processor = ModuleSpec.instantiate(config["text_processor"])()
        return cls(
            module=module,
            params=params,
            text_processor=text_processor,
            example_batch=static_dict(example_batch),
            config=config,
            dataset_statistics=static_dict(dataset_statistics),
        )


def _verify_shapes(pytree, name: str, example_pytree, starting_dim: int = 0,
                   strict: bool = False, raise_error: bool = True,
                   silent: bool = False) -> bool:
    """Checks that a pytree matches the example batch's structure and
    trailing shapes (parity: octo_model.py _verify_shapes)."""
    weak_fail, fail = False, False
    pytree_flat = flax.traverse_util.flatten_dict(pytree)
    example_flat = flax.traverse_util.flatten_dict(example_pytree)

    missing = set(example_flat.keys()) - set(pytree_flat.keys())
    if missing and not silent:
        import logging

        logging.warning(f"{name} is missing keys: {missing}")
        weak_fail = True
    extra = set(pytree_flat.keys()) - set(example_flat.keys())
    if extra and not silent:
        import logging

        logging.warning(f"{name} has extra keys: {extra}")
        weak_fail = True

    mismatched = [
        (k, v.shape, example_flat[k].shape)
        for k, v in pytree_flat.items()
        if k in example_flat
        and getattr(v, "shape", None) is not None
        and v.shape[starting_dim:] != example_flat[k].shape[starting_dim:]
    ]
    if mismatched:
        if not silent:
            import logging

            for k, shape, expected in mismatched:
                logging.error(
                    f"{name} has mismatched shape for {k}: {shape} vs "
                    f"{expected}"
                )
        fail = True

    if raise_error and (fail or (weak_fail and strict)):
        raise AssertionError(f"{name} does not match the example batch.")
    return weak_fail or fail


def _resolve_hf_checkpoint(repo_id: str) -> str:
    """Resolve an `hf://` repo to a local snapshot directory (parity:
    octo/model/octo_model.py:579-583).

    Order: (1) the local HuggingFace cache (HF_HUB_CACHE /
    ~/.cache/huggingface) with no network touched, so pre-provisioned
    egress-less hosts — this environment — work offline; (2) a live
    `snapshot_download`. Failures of both raise one actionable error
    carrying each cause and the provisioning hint.
    """
    from huggingface_hub import snapshot_download

    # read at call time: huggingface_hub freezes HF_HUB_CACHE into its
    # constants at import, which would defeat monkeypatched/test caches
    cache_dir = os.environ.get("HF_HUB_CACHE")
    try:
        return snapshot_download(
            repo_id, local_files_only=True, cache_dir=cache_dir
        )
    except Exception as cache_miss:
        try:
            return snapshot_download(repo_id, cache_dir=cache_dir)
        except Exception as network_err:
            raise FileNotFoundError(
                f"hf://{repo_id} is not in the local HuggingFace cache "
                f"({cache_miss}) and downloading failed ({network_err}). "
                "On a host with egress: `python -c \"from huggingface_hub "
                f"import snapshot_download; snapshot_download('{repo_id}')\"`"
                " then copy $HF_HUB_CACHE here."
            ) from network_err
