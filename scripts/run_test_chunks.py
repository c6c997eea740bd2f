"""Chunked test runner: the full suite as N commands, each <10 min.

The driver/CI budget caps any single command at ~10 minutes; the full suite
takes ~30. The chunks partition every test exactly once (the marks are
assigned per-file in tests/*.py; see pytest.ini):

    python -m scripts.run_test_chunks           # run all chunks sequentially
    python -m scripts.run_test_chunks --list    # print the chunk commands
    python -m scripts.run_test_chunks --chunk 2 # run one chunk
"""
import argparse
import subprocess
import sys

CHUNKS = [
    ("fast", 'not slow and not e2e'),
    ("parity", "parity"),
    ("dist", "dist"),
    ("numerics", "numerics"),
    ("heavy", "heavy"),
    ("rest", "(slow and not parity and not dist and not numerics "
     "and not heavy) or e2e"),
]


def chunk_argv(marks):
    return [sys.executable, "-m", "pytest", "tests/", "-q", "-m", marks]


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--list", action="store_true")
    parser.add_argument("--chunk", type=int, default=None,
                        help="1-based chunk index to run alone")
    args = parser.parse_args()

    if args.list:
        for i, (name, marks) in enumerate(CHUNKS, 1):
            print(f"[{i}] {name}: {' '.join(chunk_argv(marks))}")
        return 0

    selected = (
        [CHUNKS[args.chunk - 1]] if args.chunk is not None else CHUNKS
    )
    rc = 0
    for name, marks in selected:
        print(f"=== chunk {name}: -m {marks!r}", flush=True)
        result = subprocess.run(chunk_argv(marks))
        rc = rc or result.returncode
    return rc


if __name__ == "__main__":
    sys.exit(main())
