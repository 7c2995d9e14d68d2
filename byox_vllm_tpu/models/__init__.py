"""Model family registry.

The reference supports one family (Qwen3 dense). The shared functional core
in models/qwen3.py also covers Qwen2 (qkv bias, no q/k norm) and Llama (no
bias, no q/k norm) because the three differ only in those two flags — the
registry maps HF ``model_type`` to the right spec construction.
"""

from byox_vllm_tpu.models import qwen3 as _qwen3
from byox_vllm_tpu.models.qwen3 import Qwen3Spec


class _DecoderFamily:
    """Binding of the shared functional decoder to one HF model_type.

    ``attention_bias``: None reads the HF config attribute; Qwen2 must force
    True because its qkv bias is unconditional in the HF architecture and
    Qwen2Config carries no attention_bias attribute."""

    def __init__(self, qk_norm: bool, attention_bias: bool | None = None):
        self._qk_norm = qk_norm
        self._attention_bias = attention_bias

    def spec_from_hf(self, hf) -> Qwen3Spec:
        return Qwen3Spec.from_hf_config(
            hf, qk_norm=self._qk_norm, attention_bias=self._attention_bias
        )

    forward = staticmethod(_qwen3.forward)
    init_params = staticmethod(_qwen3.init_params)

    @staticmethod
    def load_params(path, spec, dtype):
        from byox_vllm_tpu.utils.loader import load_qwen3_params

        return load_qwen3_params(path, spec, dtype)


class _MoeFamily(_DecoderFamily):
    """Qwen3-MoE: the shared decoder with the routed-expert MLP branch
    (models/qwen3.py::_moe_mlp). All-sparse stacks only."""

    def spec_from_hf(self, hf) -> Qwen3Spec:
        assert not getattr(hf, "mlp_only_layers", None) and getattr(hf, "decoder_sparse_step", 1) == 1, (
            "interleaved dense/sparse MoE layer stacks are not supported"
        )
        spec = super().spec_from_hf(hf)
        assert spec.num_experts and spec.num_experts_per_tok >= 1
        return spec


_REGISTRY = {
    "qwen3": _DecoderFamily(qk_norm=True),
    "qwen2": _DecoderFamily(qk_norm=False, attention_bias=True),
    "llama": _DecoderFamily(qk_norm=False),
    "mistral": _DecoderFamily(qk_norm=False, attention_bias=False),
    "qwen3_moe": _MoeFamily(qk_norm=True),
}


def get_model(model_type: str):
    try:
        return _REGISTRY[model_type]
    except KeyError:
        raise ValueError(
            f"unsupported model_type {model_type!r}; supported: {sorted(_REGISTRY)}"
        ) from None
