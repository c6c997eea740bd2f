"""Token-level similarity of repo files vs their reference counterparts.

Strips comments/docstrings/whitespace tokens, then computes a
SequenceMatcher ratio over the remaining token strings. Used to verify the
round-2 rewrites of files flagged as transcriptions in VERDICT.md.

Usage: python scripts/similarity_check.py [repo_file ref_file]
       python scripts/similarity_check.py --all   # the flagged band
"""
import difflib
import io
import sys
import tokenize

SKIP = {
    tokenize.COMMENT, tokenize.NL, tokenize.NEWLINE, tokenize.INDENT,
    tokenize.DEDENT, tokenize.ENCODING, tokenize.ENDMARKER,
}


def tokens(path):
    out = []
    with open(path, "rb") as f:
        prev_significant = None
        for tok in tokenize.tokenize(f.readline):
            if tok.type in SKIP:
                continue
            if tok.type == tokenize.STRING and prev_significant in (
                None, ":", ";", "(",  # crude docstring heuristic:
            ):
                # statement-position string == docstring; skip
                if prev_significant != "(":
                    continue
            out.append(tok.string)
            prev_significant = tok.string
    return out


def ratio(repo_file, ref_file):
    a, b = tokens(repo_file), tokens(ref_file)
    return difflib.SequenceMatcher(a=a, b=b, autojunk=False).ratio()


FLAGGED = [
    ("hypervla_tpu/models/unet.py", "octo/model/components/unet.py"),
    ("hypervla_tpu/models/action_heads.py", "hypervla/components/action_heads.py"),
    ("hypervla_tpu/models/base_network.py", "hypervla/components/base_network.py"),
    ("hypervla_tpu/models/tokenizers.py", "octo/model/components/tokenizers.py"),
    ("hypervla_tpu/models/base_octo.py", "hypervla/components/base_octo.py"),
    ("hypervla_tpu/models/efficientnet.py", "hypervla/components/efficient_net.py"),
    ("hypervla_tpu/models/diffusion.py", "octo/model/components/diffusion.py"),
    ("hypervla_tpu/models/vit_encoders.py", "octo/model/components/vit_encoders.py"),
    ("hypervla_tpu/eval/gym_wrappers.py", "octo/utils/gym_wrappers.py"),
    ("hypervla_tpu/models/transformer.py", "hypervla/components/transformer.py"),
    ("hypervla_tpu/models/base_vit.py", "hypervla/components/base_vit.py"),
    ("hypervla_tpu/data/traj_transforms.py", "octo/data/traj_transforms.py"),
    ("hypervla_tpu/models/block_transformer.py", "octo/model/components/block_transformer.py"),
    ("hypervla_tpu/data/data_utils.py", "octo/data/utils/data_utils.py"),
    ("scripts/evaluate.py", "scripts/evaluate.py"),
]

if __name__ == "__main__":
    if len(sys.argv) == 3:
        print(f"{ratio(sys.argv[1], sys.argv[2]):.3f}")
    else:
        for repo_f, ref_f in FLAGGED:
            r = ratio(f"/root/repo/{repo_f}", f"/root/reference/{ref_f}")
            flag = "  <-- HIGH" if r >= 0.6 else ""
            print(f"{r:.3f}  {repo_f}{flag}")
