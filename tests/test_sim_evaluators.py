"""SIMPLER / LIBERO evaluation-protocol tests with mocked simulators.

The real simulators (SAPIEN/ManiSkill2, robosuite) are x86/GPU-only and not
installable here, so these tests inject mock `simpler_env` / `libero` modules
and verify the drivers' protocol: episode counts, per-episode task options,
success-rate aggregation, JSON persistence, and skip-if-computed."""
import json
import sys
import types

import numpy as np
import pytest


class _MockPolicy:
    """InferenceWrapper-shaped policy: succeed on even episodes."""

    def __init__(self):
        self.resets = 0

    def reset(self, instruction, instruction_dict=None, **kwargs):
        self.resets += 1

    def step(self, image):
        # raw, action, image, attn, model_time
        return None, np.zeros(7), image, None, 0.001


def _install_mock_simpler(monkeypatch, episode_success):
    class _Spec:
        max_episode_steps = 4

    class MockEnv:
        def __init__(self, task_name):
            self.task_name = task_name
            self.spec = _Spec()
            self.episode = -1
            self.t = 0
            self.seen_options = []

        def reset(self, seed=0, options=None):
            self.episode += 1
            self.t = 0
            self.seen_options.append(options)
            return {"obs": 0}, {}

        def get_language_instruction(self):
            return f"do {self.task_name}"

        def step(self, action):
            self.t += 1
            done = episode_success(self.episode) and self.t >= 2
            return {"obs": self.t}, 0.0, done, False, {}

        def close(self):
            pass

    envs = {}

    simpler_env = types.ModuleType("simpler_env")
    simpler_env.make = lambda name: envs.setdefault(name, MockEnv(name))
    utils = types.ModuleType("simpler_env.utils")
    env_mod = types.ModuleType("simpler_env.utils.env")
    obs_utils = types.ModuleType("simpler_env.utils.env.observation_utils")
    obs_utils.get_image_from_maniskill2_obs_dict = lambda env, obs: np.zeros(
        (64, 64, 3), np.uint8
    )
    monkeypatch.setitem(sys.modules, "simpler_env", simpler_env)
    monkeypatch.setitem(sys.modules, "simpler_env.utils", utils)
    monkeypatch.setitem(sys.modules, "simpler_env.utils.env", env_mod)
    monkeypatch.setitem(
        sys.modules, "simpler_env.utils.env.observation_utils", obs_utils
    )
    return envs


def test_simpler_protocol(tmp_path, monkeypatch):
    from hypervla_tpu.eval.simpler import evaluate

    envs = _install_mock_simpler(
        monkeypatch, episode_success=lambda ep: ep % 2 == 0
    )
    tasks = {
        "google_robot_close_top_drawer": (None, 4, None),
        "google_robot_move_near": (
            None, 2, [{"obj_init_options": {"episode_id": i}} for i in range(2)],
        ),
    }
    policy = _MockPolicy()
    results = evaluate(
        policy,
        text_encode=lambda s: {"instruction": s},
        tasks=tasks,
        eval_path=str(tmp_path),
    )
    # even episodes succeed -> 50%
    assert results["google_robot_close_top_drawer"] == 0.5
    assert results["google_robot_move_near"] == 0.5
    # per-episode options must be threaded through
    assert envs["google_robot_move_near"].seen_options == [
        {"obj_init_options": {"episode_id": 0}},
        {"obj_init_options": {"episode_id": 1}},
    ]
    # persisted + skip-if-computed
    with open(tmp_path / "success_rate.json") as f:
        assert json.load(f) == results
    resets_before = policy.resets
    again = evaluate(
        policy, text_encode=lambda s: {"instruction": s}, tasks=tasks,
        eval_path=str(tmp_path),
    )
    assert again == results and policy.resets == resets_before


def test_libero_protocol(tmp_path, monkeypatch):
    from hypervla_tpu.eval import libero as libero_driver

    class MockTask:
        name = "mock_task"
        language = "pick the mock"
        problem_folder = "f"
        bddl_file = "t.bddl"

    class MockSuite:
        n_tasks = 1

        def get_task(self, i):
            return MockTask()

        def get_task_init_states(self, i):
            return np.zeros((3, 5))

    class MockEnv:
        def __init__(self, **kwargs):
            self.t = 0

        def reset(self):
            self.t = 0

        def seed(self, s):
            pass

        def set_init_state(self, s):
            return {"agentview_image": np.zeros((64, 64, 3), np.uint8)}

        def step(self, action):
            self.t += 1
            done = self.t >= 3
            return (
                {"agentview_image": np.zeros((64, 64, 3), np.uint8)},
                0.0, done, {},
            )

        def close(self):
            pass

    libero_pkg = types.ModuleType("libero")
    libero_sub = types.ModuleType("libero.libero")
    libero_sub.benchmark = types.SimpleNamespace(
        get_benchmark_dict=lambda: {"libero_object": MockSuite}
    )
    libero_sub.get_libero_path = lambda name: "/tmp"
    libero_envs = types.ModuleType("libero.libero.envs")
    libero_envs.OffScreenRenderEnv = MockEnv
    monkeypatch.setitem(sys.modules, "libero", libero_pkg)
    monkeypatch.setitem(sys.modules, "libero.libero", libero_sub)
    monkeypatch.setitem(sys.modules, "libero.libero.envs", libero_envs)

    results = libero_driver.evaluate(
        _MockPolicy(),
        text_encode=lambda s: {"instruction": s},
        eval_path=str(tmp_path),
        num_episodes=2,
    )
    assert results == {"mock_task": 1.0}
    with open(tmp_path / "libero_object.json") as f:
        assert json.load(f) == results


def test_simpler_save_video(tmp_path, monkeypatch):
    from hypervla_tpu.eval.simpler import evaluate

    _install_mock_simpler(monkeypatch, episode_success=lambda ep: True)
    tasks = {"google_robot_close_top_drawer": (None, 1, None)}
    evaluate(
        _MockPolicy(),
        text_encode=lambda s: {"instruction": s},
        tasks=tasks,
        eval_path=str(tmp_path),
        save_video=True,
    )
    import glob

    vids = (
        glob.glob(str(tmp_path / "*succ*.mp4"))
        + glob.glob(str(tmp_path / "*succ*.gif"))
        + glob.glob(str(tmp_path / "*succ*.npz"))
    )
    assert vids, list(tmp_path.iterdir())


def test_simpler_save_attention_maps(tmp_path, monkeypatch):
    from hypervla_tpu.eval.simpler import evaluate

    _install_mock_simpler(monkeypatch, episode_success=lambda ep: True)

    class _AttnPolicy(_MockPolicy):
        def step(self, image):
            return None, np.zeros(7), image, np.ones((4, 17, 17)), 0.001

    evaluate(
        _AttnPolicy(),
        text_encode=lambda s: {"instruction": s},
        tasks={"google_robot_close_top_drawer": (None, 1, None)},
        eval_path=str(tmp_path),
        save_attention_map=True,
    )
    import pickle

    pkls = list(tmp_path.glob("*_attention.pkl"))
    assert pkls
    with open(pkls[0], "rb") as f:
        maps = pickle.load(f)
    assert maps.shape[1:] == (4, 17, 17)


def _mock_suite_90(names):
    class MockTask:
        def __init__(self, name):
            self.name = name
            self.language = f"do {name}"
            self.problem_folder = "f"
            self.bddl_file = f"{name}.bddl"

    class MockSuite:
        n_tasks = len(names)

        def get_task(self, i):
            return MockTask(names[i])

        def get_task_init_states(self, i):
            return np.zeros((3, 5))

    return MockSuite


def test_libero_90_split_protocol(tmp_path):
    """The libero_90 train/test/single_task split semantics
    (parity: /root/reference/data/libero/evaluate.py:92-104)."""
    import pickle

    from hypervla_tpu.eval.libero import resolve_task_ids

    names = ["KITCHEN_open_door", "LIVING_pick_mug", "STUDY_close_book"]
    suite = _mock_suite_90(names)()
    # split-pickle names carry a 10-char demo suffix, stripped on lookup
    split_file = tmp_path / "task_split.pkl"
    with open(split_file, "wb") as f:
        pickle.dump((
            ["STUDY_close_book_demo.hdf5", "KITCHEN_open_door_demo.hdf5"],
            ["LIVING_pick_mug_demo.hdf5"],
        ), f)

    assert resolve_task_ids(
        suite, "libero_90", split="train", split_file=str(split_file)
    ) == [2, 0]
    assert resolve_task_ids(
        suite, "libero_90", split="test", split_file=str(split_file)
    ) == [1]
    # single_task: task name from the finetune dir's third path component
    assert resolve_task_ids(
        suite, "libero_90", split="single_task",
        model_path="finetune_saves/libero_90/LIVING_pick_mug/seed_0",
    ) == [1]
    # other suites ignore the split entirely
    assert resolve_task_ids(suite, "libero_object", split="train") == [0, 1, 2]
    # explicit task_ids always win
    assert resolve_task_ids(suite, "libero_90", split="train",
                            task_ids=[2]) == [2]


def test_libero_evaluate_honors_split(tmp_path, monkeypatch):
    """End-to-end through evaluate(): only split tasks run."""
    import pickle

    from hypervla_tpu.eval import libero as libero_driver

    names = ["task_a", "task_b", "task_c"]
    MockSuite = _mock_suite_90(names)

    class MockEnv:
        def __init__(self, **kwargs):
            self.t = 0

        def reset(self):
            self.t = 0

        def seed(self, s):
            pass

        def set_init_state(self, s):
            return {"agentview_image": np.zeros((64, 64, 3), np.uint8)}

        def step(self, action):
            self.t += 1
            return (
                {"agentview_image": np.zeros((64, 64, 3), np.uint8)},
                0.0, self.t >= 2, {},
            )

        def close(self):
            pass

    libero_pkg = types.ModuleType("libero")
    libero_sub = types.ModuleType("libero.libero")
    libero_sub.benchmark = types.SimpleNamespace(
        get_benchmark_dict=lambda: {"libero_90": MockSuite}
    )
    libero_sub.get_libero_path = lambda name: "/tmp"
    libero_envs = types.ModuleType("libero.libero.envs")
    libero_envs.OffScreenRenderEnv = MockEnv
    monkeypatch.setitem(sys.modules, "libero", libero_pkg)
    monkeypatch.setitem(sys.modules, "libero.libero", libero_sub)
    monkeypatch.setitem(sys.modules, "libero.libero.envs", libero_envs)

    split_file = tmp_path / "task_split.pkl"
    with open(split_file, "wb") as f:
        pickle.dump((["task_b_demo.hdf5"], ["task_c_demo.hdf5"]), f)

    results = libero_driver.evaluate(
        _MockPolicy(),
        text_encode=lambda s: {"instruction": s},
        benchmark_name="libero_90",
        eval_path=str(tmp_path),
        num_episodes=1,
        split="train",
        split_file=str(split_file),
    )
    assert set(results) == {"task_b"}
