"""One-command provisioning of pretrained encoder weights.

Run this ON A HOST WITH NETWORK EGRESS (TPU hosts here have none), then copy
the output directory to the TPU host and point HYPERVLA_PRETRAINED_DIR at it:

    python -m scripts.provision_pretrained --out ~/pretrained
    scp -r ~/pretrained tpu-host:~/pretrained
    export HYPERVLA_PRETRAINED_DIR=~/pretrained

Artifacts written (flax msgpack):
  dinov2-base.hf.msgpack   facebook/dinov2-base params, HF layout — arms
                           tests/test_flagship_real_weights.py (full-size
                           1e-5 action parity at the real 518 grid)
  dinov2-base.msgpack      same tree, the layout load_dinov2_weights consumes
  t5-base.msgpack          t5-base encoder converted to the native T5 layout

Reference surface: /root/reference/hypervla/model.py:543-568 (DINOv2/CLIP
weight loaders) and scripts/train.py:167-175 (T5).
"""
import argparse
import os


def _save_msgpack(path, tree):
    import flax.serialization

    with open(path, "wb") as f:
        f.write(flax.serialization.msgpack_serialize(tree))
    print(f"wrote {path} ({os.path.getsize(path) / 1e6:.1f} MB)")


def provision(out_dir, dinov2=True, t5=True, clip=False):
    os.makedirs(out_dir, exist_ok=True)
    from hypervla_tpu.models.encoders.pretrained import (
        _to_builtin,
        convert_hf_t5_params,
    )

    if dinov2:
        from transformers import FlaxDinov2Model

        model = FlaxDinov2Model.from_pretrained("facebook/dinov2-base")
        tree = _to_builtin(model.params)
        _save_msgpack(os.path.join(out_dir, "dinov2-base.hf.msgpack"), tree)
        _save_msgpack(os.path.join(out_dir, "dinov2-base.msgpack"), tree)

    if t5:
        from transformers import FlaxT5EncoderModel

        model = FlaxT5EncoderModel.from_pretrained("t5-base")
        _save_msgpack(
            os.path.join(out_dir, "t5-base.msgpack"),
            _to_builtin(convert_hf_t5_params(model.params)),
        )

    if clip:
        from transformers import FlaxCLIPVisionModel

        model = FlaxCLIPVisionModel.from_pretrained(
            "openai/clip-vit-base-patch16"
        )
        _save_msgpack(
            os.path.join(out_dir, "clip-vit-base-patch16.msgpack"),
            _to_builtin(model.params),
        )


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument(
        "--out", type=str,
        default=os.environ.get("HYPERVLA_PRETRAINED_DIR", "pretrained"),
    )
    parser.add_argument("--skip_dinov2", action="store_true")
    parser.add_argument("--skip_t5", action="store_true")
    parser.add_argument("--clip", action="store_true")
    args = parser.parse_args()
    provision(args.out, dinov2=not args.skip_dinov2, t5=not args.skip_t5,
              clip=args.clip)


if __name__ == "__main__":
    main()
