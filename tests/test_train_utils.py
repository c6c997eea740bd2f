"""Tests for training utilities: merge_params, config diff, batched_apply,
flat<->dict param conversion, process_text."""
import numpy as np
import pytest

from hypervla_tpu.train.utils import (
    batched_apply,
    check_config_diff,
    convert_flattened_params_to_dict_params,
    filter_eval_datasets,
    get_base_model_shape,
    merge_params,
    process_text,
)


def test_merge_params_matching_and_mismatched():
    target = {"a": {"kernel": np.zeros((2, 2)), "bias": np.zeros(2)},
              "b": np.zeros(3)}
    pretrained = {"a": {"kernel": np.ones((2, 2)), "bias": np.ones(5)},
                  "c": np.ones(1)}
    merged = merge_params(target, pretrained)
    np.testing.assert_array_equal(merged["a"]["kernel"], np.ones((2, 2)))
    np.testing.assert_array_equal(merged["a"]["bias"], np.zeros(2))  # mismatch
    np.testing.assert_array_equal(merged["b"], np.zeros(3))  # missing


def test_check_config_diff():
    a = {"x": 1, "nested": {"y": 2}}
    b = {"x": 1, "nested": {"y": 3}}
    assert check_config_diff(a, b, silent=True)
    assert not check_config_diff(a, dict(a), silent=True)


def test_batched_apply_pads_and_chunks():
    calls = []

    def fn(x):
        calls.append(x.shape[0])
        return x * 2

    wrapped = batched_apply(fn, batch_size=4)
    out = wrapped(np.arange(10, dtype=np.float32).reshape(10, 1))
    np.testing.assert_array_equal(out[:, 0], np.arange(10) * 2)
    assert all(c == 4 for c in calls)  # always called at the fixed size


def test_flat_dict_param_conversion_roundtrip():
    params = {
        "layer": {"kernel": np.arange(6, dtype=np.float32).reshape(2, 3)},
        "bias": np.arange(2, dtype=np.float32),
    }
    total, shapes, index = get_base_model_shape(params)
    assert total == 8
    flat = np.concatenate(
        [np.ravel(v) for v in [params["bias"], params["layer"]["kernel"]]]
    )
    # flatten_dict ordering is insertion order; rebuild and compare by key
    import flax

    flat_params = np.zeros(total, np.float32)
    for key, (start, end) in index.items():
        leaf = flax.traverse_util.flatten_dict(params)[key]
        flat_params[start:end] = np.ravel(leaf)
    rebuilt = convert_flattened_params_to_dict_params(flat_params, shapes, index)
    np.testing.assert_array_equal(
        rebuilt["layer"]["kernel"], params["layer"]["kernel"]
    )
    np.testing.assert_array_equal(rebuilt["bias"], params["bias"])


def test_filter_eval_datasets():
    kwargs = [{"name": "a"}, {"name": "b"}, {"name": "c"}]
    filtered, weights = filter_eval_datasets(kwargs, [1.0, 2.0, 3.0], ["b"])
    assert [k["name"] for k in filtered] == ["b"] and weights == [2.0]


def test_process_text_tokenizes_and_keeps_strings():
    from hypervla_tpu.data.text_processing import HFTokenizer

    tokenizer = HFTokenizer(
        "t5-base",
        tokenizer_kwargs={"max_length": 6, "padding": "max_length",
                          "truncation": True, "return_tensors": "np"},
    )
    batch = {
        "task": {
            "language_instruction": np.array(
                [b"pick up the cup", b"close the drawer"], dtype=object
            )
        }
    }
    out = process_text(batch, tokenizer)
    assert "instruction_string" in out["task"]
    assert out["task"]["language_instruction"]["input_ids"].shape == (2, 6)
