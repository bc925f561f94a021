"""BERT text encoder (reference: models/msa/networks/bert_text_encoder.py:13-79).

Input layout preserved: (batch, 3, seq) rows = input_ids / attention_mask /
token_type_ids; output = last hidden states (batch, seq, hidden).

TPU-native: HF FlaxBertModel. `pretrained_path` loads local weights when the
directory exists (the reference points at an unshipped local
`pretrained_model/bert_en`); otherwise a freshly initialized BERT of the
standard base config is used and a warning logged (zero-egress environment —
no hub downloads).
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from mmtpu.utils.logging import get_logger
from mmtpu.utils.utils import format_path_with_env

logger = get_logger()


_BERT_CACHE: dict = {}


def _make_bert(
    pretrained_path: Optional[str],
    hidden_size: int = 768,
    num_hidden_layers: int = 12,
    num_attention_heads: int = 12,
):
    # setup() re-runs on EVERY module binding (init, each jit trace, each
    # unjitted apply) — without this cache a real bert-base checkpoint is
    # re-read and torch→flax-converted several times per run just to be
    # discarded after the first init. Returns (flax_module, host_params):
    # the params are cached as HOST arrays because a cached DEVICE pytree
    # would be initialized into a TrainState whose donated buffers are
    # freed by the first train step — a second run in the same process
    # would then init from deleted buffers.
    import jax

    key = (str(pretrained_path), hidden_size, num_hidden_layers,
           num_attention_heads)
    if key in _BERT_CACHE:
        return _BERT_CACHE[key]
    model = _build_bert(pretrained_path, hidden_size, num_hidden_layers,
                        num_attention_heads)
    entry = (model.module, jax.device_get(model.params))
    _BERT_CACHE[key] = entry
    return entry


def _build_bert(
    pretrained_path: Optional[str],
    hidden_size: int = 768,
    num_hidden_layers: int = 12,
    num_attention_heads: int = 12,
):
    from transformers import BertConfig, FlaxBertModel

    if pretrained_path:
        path = Path(format_path_with_env(str(pretrained_path)))
        if path.exists():
            # HF-style local checkpoint dir; from_pt converts torch weights
            # to flax in-process (tested against a torch BertModel forward
            # in tests/test_self_mm.py::TestBertIngestion)
            return FlaxBertModel.from_pretrained(str(path), from_pt=True)
        from mmtpu.utils.printing import get_console

        msg = (
            f"BERT pretrained path {path} not found — Self-MM will train "
            "with a RANDOMLY INITIALIZED text encoder (the reference loads "
            "pretrained BERT weights here, bert_text_encoder.py:32-33); "
            "place an HF-style checkpoint at that path for parity"
        )
        logger.warning(msg)
        get_console().warning(msg)
    config = BertConfig(
        hidden_size=hidden_size,
        num_hidden_layers=num_hidden_layers,
        num_attention_heads=num_attention_heads,
        intermediate_size=hidden_size * 4,
    )
    return FlaxBertModel(config)


class BertTextEncoder(nn.Module):
    language: str = "en"
    use_finetune: bool = False
    pretrained_path: str = "pretrained_model/bert_en"
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12

    def get_embedding_size(self) -> int:
        return self.hidden_size

    def setup(self) -> None:
        assert self.language in ("en", "cn")
        self._module, self._hf_params = _make_bert(
            self.pretrained_path, self.hidden_size,
            self.num_hidden_layers, self.num_attention_heads,
        )

    @nn.compact
    def __call__(self, text: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        input_ids = text[:, 0, :].astype(jnp.int32)
        attention_mask = text[:, 1, :].astype(jnp.int32)
        token_type_ids = text[:, 2, :].astype(jnp.int32)
        # BERT weights live in 'params' either way; when use_finetune is
        # False the stop_gradient below zeroes their grads (reference wraps
        # the call in no_grad, bert_text_encoder.py:66-73).
        params = self.param("bert", lambda rng: self._hf_params)
        # reference parity: with use_finetune the torch BERT runs in train
        # mode (dropout ACTIVE) during training; frozen mode matches the
        # reference's no_grad eval-style pass (bert_text_encoder.py:61-73)
        deterministic = not (train and self.use_finetune)
        kwargs = {}
        if not deterministic:
            kwargs["rngs"] = {"dropout": self.make_rng("dropout")}
        out = self._module.apply(
            {"params": params},
            input_ids=input_ids,
            attention_mask=attention_mask,
            token_type_ids=token_type_ids,
            deterministic=deterministic,
            **kwargs,
        )
        hidden = out.last_hidden_state
        if not self.use_finetune:
            hidden = jnp.asarray(hidden)
            import jax

            hidden = jax.lax.stop_gradient(hidden)
        return hidden
