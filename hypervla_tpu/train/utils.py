"""Training utilities (parity: octo/utils/train_utils.py leftovers and
hypervla/utils.py): batched apply, config diffing, param merging, batch text
processing, flat<->dict param conversion, and weight loaders."""
import logging
from typing import Callable, Optional

import flax
import jax
import numpy as np

from hypervla_tpu.typing import Config, Data, Params

WeightLoader = Callable[[Params], Params]


def batched_apply(fn, batch_size: int):
    """Wraps a fixed-batch-size jitted fn to accept variable batch sizes by
    padding + chunking."""

    def pad_to_size(arr, size):
        return np.pad(
            arr, ((0, size - len(arr)), *[(0, 0)] * (arr.ndim - 1))
        )

    def get_batch_size(tree):
        return next(iter(jax.tree_util.tree_leaves(tree))).shape[0]

    def wrapped_fn(*args, **kwargs):
        input_batch_size = get_batch_size((args, kwargs))
        outputs = []
        for i in range(0, input_batch_size, batch_size):
            step_batch_size = min(batch_size, input_batch_size - i)
            step_args, step_kwargs = jax.tree_util.tree_map(
                lambda arr: pad_to_size(arr[i:i + batch_size], batch_size),
                (args, kwargs),
            )
            step_output = jax.device_get(fn(*step_args, **step_kwargs))
            outputs.append(
                jax.tree_util.tree_map(
                    lambda arr: arr[:step_batch_size], step_output
                )
            )
        return jax.tree_util.tree_map(
            lambda *xs: np.concatenate(xs, axis=0), *outputs
        )

    return wrapped_fn


def filter_eval_datasets(dataset_kwargs_list, sample_weights,
                         eval_datasets=None):
    if sample_weights is None:
        sample_weights = [1.0] * len(dataset_kwargs_list)
    if eval_datasets is None:
        return dataset_kwargs_list, sample_weights
    if len(eval_datasets) == 0:
        return [], []
    pairs = [
        (dkwargs, weight)
        for dkwargs, weight in zip(dataset_kwargs_list, sample_weights)
        if dkwargs["name"] in eval_datasets
    ]
    return list(map(list, zip(*pairs)))


def check_config_diff(new_conf: Config, old_conf: Config, silent: bool = False):
    """Reports differences between two config dicts; returns truthy if any."""
    to_dict = lambda c: c.to_dict() if hasattr(c, "to_dict") else c
    new_flat = flax.traverse_util.flatten_dict(to_dict(new_conf))
    old_flat = flax.traverse_util.flatten_dict(to_dict(old_conf))

    if set(new_flat.keys()) != set(old_flat.keys()) and not silent:
        logging.info(
            "New config contains extra items: %s",
            set(new_flat.keys()) - set(old_flat.keys()),
        )
        logging.info(
            "New config doesn't contain items: %s",
            set(old_flat.keys()) - set(new_flat.keys()),
        )
    mismatched = {
        k: (new_flat[k], old_flat[k])
        for k in new_flat
        if k in old_flat and new_flat[k] != old_flat[k]
    }
    if mismatched and not silent:
        logging.info("New config contains keys with new values: %s", mismatched)
    return mismatched or (set(new_flat.keys()) != set(old_flat.keys()))


def merge_params(target_params: Params, pretrained_params: Params) -> Params:
    """Copies pretrained params into target for matching key + shape."""
    flat_target = flax.traverse_util.flatten_dict(target_params)
    flat_pretrained = flax.traverse_util.flatten_dict(pretrained_params)
    keys_to_update = [
        k
        for k in flat_target
        if k in flat_pretrained
        and flat_target[k].shape == flat_pretrained[k].shape
    ]
    missing = [k for k in flat_target if k not in flat_pretrained]
    mismatched = [
        k
        for k in flat_target
        if k in flat_pretrained
        and flat_target[k].shape != flat_pretrained[k].shape
    ]
    if missing or mismatched:
        logging.info("#### Parameters skipped during model loading: ####")
        for key in missing:
            logging.info(f"Missing in pretrained, skipping: {'.'.join(key)}")
        for key in mismatched:
            logging.info(f"Shape mismatch, skipping: {'.'.join(key)}")
    flat_target = dict(flat_target)
    flat_target.update({k: flat_pretrained[k] for k in keys_to_update})
    return flax.traverse_util.unflatten_dict(flat_target)


def process_text(batch: Data, text_processor) -> Data:
    """Tokenizes the raw language instruction strings in a batch; keeps the
    raw strings under instruction_string for per-task logging."""
    if text_processor is None:
        batch["task"].pop("language_instruction")
    else:
        batch["task"]["instruction_string"] = batch["task"][
            "language_instruction"
        ]
        batch["task"]["language_instruction"] = text_processor.encode(
            [
                s.decode("utf-8") if isinstance(s, bytes) else str(s)
                for s in batch["task"]["language_instruction"]
            ]
        )
        if "rephrased_task" in batch:
            batch["rephrased_task"]["language_instruction"] = (
                text_processor.encode(
                    [
                        s.decode("utf-8") if isinstance(s, bytes) else str(s)
                        for s in batch["rephrased_task"][
                            "language_instruction"
                        ]
                    ]
                )
            )
    return batch


# ---------------- flat-vector <-> param-dict conversion ----------------
# (parity: hypervla/utils.py — used by the 'full' generation strategy)


def get_base_model_shape(params):
    """Returns (total_param_num, flat shapes dict, flat (start, end) ranges)."""
    param_shapes = jax.tree_util.tree_map(lambda x: x.shape, params)
    flat_shapes = flax.traverse_util.flatten_dict(param_shapes)
    param_num = jax.tree_util.tree_map(lambda x: int(np.prod(x.shape)), params)
    flat_num = flax.traverse_util.flatten_dict(param_num)
    total = int(np.sum(list(flat_num.values())))
    cumsum = np.concatenate(
        [np.zeros(1, dtype=np.int64), np.cumsum(list(flat_num.values()))]
    )
    flat_index = {
        key: (int(cumsum[i]), int(cumsum[i + 1]))
        for i, key in enumerate(flat_shapes.keys())
    }
    return total, flat_shapes, flat_index


def convert_flattened_params_to_dict_params(flattened_params, flat_shapes,
                                            flat_index):
    dict_params = {
        key: flattened_params[flat_index[key][0]:flat_index[key][1]].reshape(
            flat_shapes[key]
        )
        for key in flat_shapes
    }
    return flax.traverse_util.unflatten_dict(dict_params)


def hf_weights_loader(params, hf_model: str):
    """Loads HF weights into the `hf_model` subtree (requires local cache;
    falls back to a no-op with a warning when files are unavailable)."""
    try:
        from transformers import AutoConfig, FlaxAutoModel, FlaxT5EncoderModel

        if "t5" in hf_model:
            config = AutoConfig.from_pretrained(hf_model, local_files_only=True)
            model = FlaxT5EncoderModel.from_pretrained(
                hf_model, config=config, local_files_only=True
            )
        else:
            model = FlaxAutoModel.from_pretrained(hf_model,
                                                  local_files_only=True)
    except Exception as e:
        logging.warning(f"hf_weights_loader: cannot load {hf_model} ({e}); "
                        "keeping existing params.")
        return params

    model_variables = model.params
    replaced = False

    def find_and_replace(node, key, replacement):
        nonlocal replaced
        for k in node.keys():
            if k == key:
                node[k] = replacement
                replaced = True
                return
            if isinstance(node[k], dict):
                find_and_replace(node[k], key, replacement)

    find_and_replace(params, "hf_model", model_variables)
    assert replaced, "Failed to load weights"
    return params
