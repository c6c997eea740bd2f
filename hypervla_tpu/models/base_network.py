"""BaseNetwork: the generated policy.

Capability parity with hypervla/components/base_network.py: selects an
encoder (cnn / vit / octo) and an action head (diffusion / continuous /
mix / discrete), and exposes `loss` and `predict_action`. At train time its
parameters are per-sample tensors emitted by the hypernetwork, applied
functionally under vmap — so this module is written to be bind()-free and
shape-static.

The `encoder` / `action_head` submodule names are part of the generated
weight plan's block naming; they must not change.
"""
import flax.linen as nn

from hypervla_tpu.models.action_heads import (
    ContinuousActionHead,
    DiffusionActionHead,
    DiscreteActionHead,
    MixActionHead,
)
from hypervla_tpu.models.base_cnn import CNN
from hypervla_tpu.models.base_vit import ViT
from hypervla_tpu.models.token_group import TokenGroup
from hypervla_tpu.utils.spec import ModuleSpec


def _readout_token_count(action_head_type, action_head_kwargs,
                         action_horizon, action_dim) -> int:
    """How many readout ("action") tokens the encoder must append: the
    discrete head reads one token per unit of its token layout; regression
    heads read one per horizon step or one total."""
    if action_head_type == "discrete":
        per = {
            "action_dim_and_action_horizon": action_horizon * action_dim,
            "action_horizon": action_horizon,
        }
        return per[action_head_kwargs["discrete_token_type"]]
    return action_horizon if action_head_kwargs["token_per_horizon"] else 1


class BaseNetwork(nn.Module):
    model_type: str
    action_head_type: str
    octo_kwargs: dict
    cnn_kwargs: dict
    vit_kwargs: dict
    action_head_kwargs: dict
    action_horizon: int = 4
    action_dim: int = 7

    # ----------------------------- construction -----------------------------

    def _build_encoder(self, n_readout_tokens: int):
        if self.model_type == "cnn":
            return CNN(**self.cnn_kwargs)
        if self.model_type == "vit":
            return ViT(**self.vit_kwargs,
                       action_token_num=n_readout_tokens)
        if self.model_type == "octo":
            from hypervla_tpu.models.base_octo import OctoTransformer

            kw = self.octo_kwargs
            pretrained_tok = kw.get("use_pretrained_image_tokenizer", False)
            obs_tokenizers = (
                {} if pretrained_tok else {
                    k: ModuleSpec.instantiate(spec)()
                    for k, spec in kw["observation_tokenizers"].items()
                }
            )
            return OctoTransformer(
                observation_tokenizers=obs_tokenizers,
                readouts={"action": n_readout_tokens},
                transformer_kwargs=kw["transformer_kwargs"],
                token_embedding_size=kw["token_embedding_size"],
                max_horizon=kw["max_horizon"],
                repeat_task_tokens=kw["repeat_task_tokens"],
                use_correct_attention=True,
                use_pretrained_image_tokenizer=pretrained_tok,
            )
        raise NotImplementedError(f"unknown model_type {self.model_type}")

    def _build_action_head(self):
        kw = self.action_head_kwargs
        common = dict(
            readout_key="readout_action",
            use_map=False,
            action_horizon=self.action_horizon,
            action_dim=self.action_dim,
        )
        if self.action_head_type == "diffusion":
            return DiffusionActionHead(
                **common,
                n_diffusion_samples=1,
                dropout_rate=kw.get("diffusion_dropout_rate", 0.0),
                num_blocks=kw.get("num_blocks", 3),
                hidden_dim=kw.get("hidden_dim", 256),
            )
        if self.action_head_type == "continuous":
            return ContinuousActionHead(**common, **kw)
        if self.action_head_type == "mix":
            return MixActionHead(
                **common,
                max_action=kw.get("max_action", 5.0),
                token_per_horizon=kw["token_per_horizon"],
                squash_continuous_action=kw["squash_continuous_action"],
                tanh_scaling_factor=kw.get("tanh_scaling_factor", 5.0),
                clip_target=kw["clip_target"],
                hidden_dims=kw.get("hidden_dims", tuple()),
            )
        if self.action_head_type == "discrete":
            return DiscreteActionHead(
                **common, token_per=kw["discrete_token_type"]
            )
        raise NotImplementedError(
            f"unknown action_head_type {self.action_head_type}"
        )

    def setup(self):
        n_readout_tokens = _readout_token_count(
            self.action_head_type, self.action_head_kwargs,
            self.action_horizon, self.action_dim,
        )
        self.encoder = self._build_encoder(n_readout_tokens)
        self.action_head = self._build_action_head()

    # ------------------------------- forward --------------------------------

    def encode(self, images, instruction_embeddings, train=True,
               image_embeddings=None):
        """ViT path: run the tiny policy transformer and wrap its readout
        embeddings in the octo action-head interface (adds a window dim)."""
        action_embedding, attention_map = self.encoder(
            images,
            instruction_embeddings,
            train=train,
            image_embeddings=image_embeddings,
        )
        readouts = {
            "readout_action": TokenGroup(action_embedding[:, None], None)
        }
        return readouts, attention_map

    def _embed_batch(self, batch, train):
        """Dispatches a training batch through the encoder; returns the
        action-head input dict and (for the ViT) the policy attention map."""
        if self.model_type == "octo":
            embedding_dict = self.encoder(
                batch["observation"],
                batch["task"],
                batch["observation"]["timestep_pad_mask"],
                train=train,
            )
            return embedding_dict, None
        # vit: precomputed patch embeddings ride in the observation —
        # SigLIP always; DINOv2/CLIP when the train step hoists the shared
        # trunk out of its per-sample vmap (train_step.py)
        image_embeddings = batch["observation"].get("patch_embeddings")
        return self.encode(
            batch["observation"]["image_primary"].squeeze(1),
            batch["task"]["language_instruction"]["token_embedding"],
            train=train,
            image_embeddings=image_embeddings,
        )

    def __call__(self, batch):
        embedding_dict, _ = self._embed_batch(batch, train=True)
        return self.action_head(embedding_dict)

    def loss(self, batch, train=True):
        embedding_dict, attention_map = self._embed_batch(batch, train)
        loss, metrics = self.action_head.loss(
            embedding_dict,
            batch["action"],
            batch["observation"]["timestep_pad_mask"],
            batch["action_pad_mask"],
            train=train,
        )
        return loss, metrics, attention_map

    def predict_action(self, observation, task, timestep_pad_mask, rng,
                       train=False, image_embeddings=None):
        if observation.shape[1] == 1:
            observation = observation.squeeze(1)
        embedding_dict, attention_map = self.encode(
            observation, task, train=train,
            image_embeddings=image_embeddings,
        )
        return self.action_head.predict_action(
            embedding_dict, rng=rng, train=train, argmax=True,
            temperature=1.0,
        )
