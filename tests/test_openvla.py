"""OpenVLAInference wrapper test with a mocked HF model (the real 7B
checkpoint is gated/not present); verifies prompt format, action conversion,
and the sticky-gripper protocol."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")


class _Inputs(dict):
    def to(self, device, dtype=None):
        return self


class _MockProcessor:
    def __init__(self):
        self.prompts = []

    def __call__(self, prompt, image):
        self.prompts.append(prompt)
        return _Inputs()


class _MockModel:
    device = "cpu"

    def __init__(self):
        self.raw = np.array([0.01, 0.02, 0.03, 0.1, 0.2, 0.3, 1.0])

    def eval(self):
        return self

    def predict_action(self, unnorm_key=None, do_sample=False, **inputs):
        assert unnorm_key == "fractal20220817_data"
        return self.raw


def test_openvla_wrapper(monkeypatch):
    import transformers

    proc = _MockProcessor()
    model = _MockModel()
    monkeypatch.setattr(
        transformers.AutoProcessor, "from_pretrained",
        classmethod(lambda cls, *a, **k: proc),
    )
    monkeypatch.setattr(
        transformers.AutoModelForVision2Seq, "from_pretrained",
        classmethod(lambda cls, *a, **k: model),
    )
    from hypervla_tpu.eval.openvla_interface import OpenVLAInference

    policy = OpenVLAInference(policy_setup="google_robot", image_size=32)
    policy.reset("Pick Up The Block")
    frame = np.zeros((64, 64, 3), np.uint8)
    raw, flat, img, _, _ = policy.step(frame)
    assert proc.prompts[-1] == (
        "In: What action should the robot take to pick up the block?\nOut:"
    )
    np.testing.assert_array_equal(raw, model.raw)
    assert flat.shape == (7,)
    np.testing.assert_allclose(flat[:3], raw[:3], atol=1e-6)
    assert flat[-1] == 0.0  # first step: no previous gripper action
    assert img.shape == (32, 32, 3)

    # gripper flip triggers the sticky state machine
    model.raw = np.array([0, 0, 0, 0, 0, 0, 0.0])
    _, flat, *_ = policy.step(frame)
    assert policy.sticky_action_is_on and flat[-1] == 1.0
