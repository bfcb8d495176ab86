"""CLIP teacher loading: torch checkpoint -> JAX pytree.

TPU-native equivalent of reference model/utils.py.

The OpenAI checkpoints are torchscript archives; torch (CPU wheel, IO only —
never on the compute path) parses them.  Plain ``torch.save`` state dicts
are accepted too so tests and conversion tools can fabricate teachers.
Architecture hyperparameters are inferred from the state dict exactly like
the reference (get_transformer_para utils.py:81-90, get_visual_para
utils.py:93-129).

Weight layout conversions (torch -> flax):
* Linear weight [out, in]        -> kernel [in, out]        (transpose)
* conv1 weight [O, I, P, P]      -> patch kernel [(P P I), O]
  matching our patchify pixel order (models/vit.py)
* fused attn in_proj [3D, D]     -> in_proj kernel [D, 3D]  (q,k,v order kept)
* LayerNorm weight/bias          -> scale/bias
"""

from __future__ import annotations

import hashlib
import os
import urllib.request
import warnings
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

from distillclip_tpu.models.clip import CLIPModel
from distillclip_tpu.models.encoders import ImageEncoder, TextEncoder
from distillclip_tpu.models.resnet import ModifiedResNet, map_resnet_weights

# Official OpenAI CLIP checkpoint URLs (reference model/utils.py:18-28).
MODELS = {
    "RN50": "https://openaipublic.azureedge.net/clip/models/afeb0e10f9e5a86da6080e35cf09123aca3b358a0c3e3b6c78a7b63bc04b6762/RN50.pt",
    "RN101": "https://openaipublic.azureedge.net/clip/models/8fa8567bab74a42d41c5915025a8e4538c3bdbe8804a470a72f30b0d94fab599/RN101.pt",
    "RN50x4": "https://openaipublic.azureedge.net/clip/models/7e526bd135e493cef0776de27d5f42653e6b4c8bf9e0f653bb11773263205fdd/RN50x4.pt",
    "RN50x16": "https://openaipublic.azureedge.net/clip/models/52378b407f34354e150460fe41077663dd5b39c54cd0bfd2b27167a4a06ec9aa/RN50x16.pt",
    "RN50x64": "https://openaipublic.azureedge.net/clip/models/be1cfb55d75a9666199fb2206c106743da0f6468c9d327f3e0d0a543a9919d9c/RN50x64.pt",
    "ViT-B/32": "https://openaipublic.azureedge.net/clip/models/40d365715913c9da98579312b702a82c18be219cc2a73407c4526f58eba950af/ViT-B-32.pt",
    "ViT-B/16": "https://openaipublic.azureedge.net/clip/models/5806e77cd80f8b59890b7e101eabd078d9fb84e6937f9e85e4ecb61988df416f/ViT-B-16.pt",
    "ViT-L/14": "https://openaipublic.azureedge.net/clip/models/b8cca3fd41ae0c99ba7e8951adf17d267cdb84cd88be6f7c2e0eca1737a03836/ViT-L-14.pt",
    "ViT-L/14@336px": "https://openaipublic.azureedge.net/clip/models/3035c92b350959924f9f00213499208652fc7ea050643e8b385c2dac08641f02/ViT-L-14-336px.pt",
}


def available_models() -> List[str]:
    return list(MODELS.keys())


def download(url: str, root: str) -> str:
    """Download with SHA256 verification (reference _download, utils.py:31-61)."""
    os.makedirs(root, exist_ok=True)
    filename = os.path.basename(url)
    expected_sha256 = url.split("/")[-2]
    target = os.path.join(root, filename)

    if os.path.exists(target) and not os.path.isfile(target):
        raise RuntimeError(f"{target} exists and is not a regular file")
    if os.path.isfile(target):
        with open(target, "rb") as f:
            if hashlib.sha256(f.read()).hexdigest() == expected_sha256:
                return target
        warnings.warn(f"{target} exists but SHA256 mismatches; re-downloading")

    with urllib.request.urlopen(url) as source, open(target, "wb") as output:
        while True:
            buf = source.read(1 << 20)
            if not buf:
                break
            output.write(buf)
    with open(target, "rb") as f:
        if hashlib.sha256(f.read()).hexdigest() != expected_sha256:
            raise RuntimeError("downloaded checkpoint fails SHA256 verification")
    return target


# ---------------------------------------------------------------------------
# state dict IO
# ---------------------------------------------------------------------------


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a torchscript archive or plain torch checkpoint into fp32 numpy.

    Torch-free on the load path (SURVEY.md §7 step 2): zip-format files —
    both torchscript archives like the official CLIP checkpoints and plain
    ``torch.save`` zips — are parsed by ``torch_reader`` (pickle + raw
    storages, no torch import).  torch remains only a last-resort fallback
    for legacy non-zip files.
    """
    from distillclip_tpu.models.torch_reader import UnsupportedTorchFile, read_torch_file

    try:
        sd = read_torch_file(path)
        return {k: np.asarray(v, dtype=np.float32) for k, v in sd.items()}
    except UnsupportedTorchFile:
        pass

    import torch  # legacy formats only

    with open(path, "rb") as f:
        try:
            model = torch.jit.load(f, map_location="cpu").eval()
            sd = model.state_dict()
        except Exception:
            f.seek(0)
            obj = torch.load(f, map_location="cpu", weights_only=False)
            sd = obj.get("state_dict", obj) if isinstance(obj, dict) else obj.state_dict()
    return {k: v.detach().to(torch.float32).numpy() for k, v in sd.items()}


def resolve_checkpoint(name: str, download_root: Optional[str] = None) -> str:
    """Name or path -> local checkpoint path (reference load, utils.py:68-78)."""
    if name in MODELS:
        return download(MODELS[name], download_root or os.path.expanduser("~/.cache/clip"))
    if os.path.isfile(name):
        return name
    raise RuntimeError(f"Model {name} not found; available models = {available_models()}")


# ---------------------------------------------------------------------------
# hyperparameter inference (reference utils.py:81-129)
# ---------------------------------------------------------------------------


def get_transformer_para(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    return {
        "output_dim": sd["text_projection"].shape[1],
        "context_length": sd["positional_embedding"].shape[0],
        "vocab_size": sd["token_embedding.weight"].shape[0],
        "width": sd["ln_final.weight"].shape[0],
        "heads": sd["ln_final.weight"].shape[0] // 64,
        "layers": len(
            {k.split(".")[2] for k in sd if k.startswith("transformer.resblocks")}
        ),
    }


def get_visual_para(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    if "visual.proj" in sd:  # ViT
        vision_width = sd["visual.conv1.weight"].shape[0]
        vision_layers = len(
            [k for k in sd if k.startswith("visual.") and k.endswith(".attn.in_proj_weight")]
        )
        patch = sd["visual.conv1.weight"].shape[-1]
        grid = round((sd["visual.positional_embedding"].shape[0] - 1) ** 0.5)
        return {
            "kind": "vit",
            "layers": vision_layers,
            "width": vision_width,
            "patch_size": patch,
            "input_resolution": patch * grid,
            "heads": vision_width // 64,
            "output_dim": sd["text_projection"].shape[1],
        }
    counts = [
        len({k.split(".")[2] for k in sd if k.startswith(f"visual.layer{b}")})
        for b in (1, 2, 3, 4)
    ]
    vision_width = sd["visual.layer1.0.conv1.weight"].shape[0]
    output_width = round((sd["visual.attnpool.positional_embedding"].shape[0] - 1) ** 0.5)
    assert output_width ** 2 + 1 == sd["visual.attnpool.positional_embedding"].shape[0]
    return {
        "kind": "resnet",
        "layers": tuple(counts),
        "width": vision_width,
        "input_resolution": output_width * 32,
        "heads": vision_width * 32 // 64,
        "output_dim": sd["text_projection"].shape[1],
    }


# ---------------------------------------------------------------------------
# weight mapping
# ---------------------------------------------------------------------------


def _ln(sd, prefix):
    return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def _linear(sd, prefix):
    out = {"kernel": sd[f"{prefix}.weight"].T}
    if f"{prefix}.bias" in sd:
        out["bias"] = sd[f"{prefix}.bias"]
    return out


def _resblock(sd, prefix) -> Dict[str, Any]:
    return {
        "ln_1": _ln(sd, f"{prefix}.ln_1"),
        "ln_2": _ln(sd, f"{prefix}.ln_2"),
        "attn": {
            "in_proj": {
                "kernel": sd[f"{prefix}.attn.in_proj_weight"].T,
                "bias": sd[f"{prefix}.attn.in_proj_bias"],
            },
            "out_proj": _linear(sd, f"{prefix}.attn.out_proj"),
        },
        "mlp": {
            "c_fc": _linear(sd, f"{prefix}.mlp.c_fc"),
            "c_proj": _linear(sd, f"{prefix}.mlp.c_proj"),
        },
    }


def map_visual_weights(sd: Dict[str, np.ndarray], layers: int) -> Dict[str, Any]:
    """'visual.*' torch keys -> VisionTransformer param dict ('visual' scope)."""
    conv = sd["visual.conv1.weight"]  # [O, I, P, P]
    O, I, P, _ = conv.shape
    patch_kernel = conv.transpose(2, 3, 1, 0).reshape(P * P * I, O)
    params: Dict[str, Any] = {
        "patch_kernel": patch_kernel,
        "class_embedding": sd["visual.class_embedding"],
        "positional_embedding": sd["visual.positional_embedding"],
        "ln_pre": _ln(sd, "visual.ln_pre"),
        "ln_post": _ln(sd, "visual.ln_post"),
        "proj": sd["visual.proj"],
        "transformer": {
            f"resblocks_{i}": _resblock(sd, f"visual.transformer.resblocks.{i}")
            for i in range(layers)
        },
    }
    return params


def map_text_weights(sd: Dict[str, np.ndarray], layers: int) -> Dict[str, Any]:
    """Text-tower torch keys -> TextTransformer param dict ('text' scope)."""
    return {
        "token_embedding": {"embed": {"embedding": sd["token_embedding.weight"]}},
        "positional_embedding": sd["positional_embedding"],
        "ln_final": _ln(sd, "ln_final"),
        "text_projection": sd["text_projection"],
        "transformer": {
            f"resblocks_{i}": _resblock(sd, f"transformer.resblocks.{i}")
            for i in range(layers)
        },
    }


# ---------------------------------------------------------------------------
# public loaders (reference teacher_load, utils.py:132-181)
# ---------------------------------------------------------------------------


def _as_jnp(tree):
    import jax.numpy as jnp

    if isinstance(tree, dict):
        return {k: _as_jnp(v) for k, v in tree.items()}
    if isinstance(tree, list):
        return [_as_jnp(v) for v in tree]
    return jnp.asarray(tree, jnp.float32)


def load_image_teacher(
    name: str,
    download_root: Optional[str] = None,
    need_layers: Optional[Sequence[int]] = None,
) -> Tuple[Any, Dict[str, Any]]:
    """-> (ImageEncoder | ModifiedResNet module, {'params': ...})."""
    sd = load_torch_state_dict(resolve_checkpoint(name, download_root))
    para = get_visual_para(sd)
    kind = para.pop("kind")
    if kind == "vit":
        module = ImageEncoder(is_student=False, need_layers=need_layers, **para)
        params = {"visual": map_visual_weights(sd, para["layers"])}
        return module, {"params": _as_jnp(params)}
    module = ModifiedResNet(
        layers=para["layers"],
        width=para["width"],
        input_resolution=para["input_resolution"],
        heads=para["heads"],
        output_dim=para["output_dim"],
    )
    params = map_resnet_weights(sd, para["layers"])
    return module, {"params": _as_jnp(params)}


def load_text_teacher(
    name: str,
    download_root: Optional[str] = None,
    need_layers: Optional[Sequence[int]] = None,
) -> Tuple[TextEncoder, Dict[str, Any]]:
    sd = load_torch_state_dict(resolve_checkpoint(name, download_root))
    para = get_transformer_para(sd)
    module = TextEncoder(is_student=False, need_layers=need_layers, **para)
    params = {"text": map_text_weights(sd, para["layers"])}
    return module, {"params": _as_jnp(params)}


def teacher_load(
    teacher_name: str,
    download_root: Optional[str] = None,
    model_type: str = "image",
    need_layers: Optional[Sequence[int]] = None,
):
    """-> (module, variables) for 'image' | 'text' | 'all' teachers."""
    if model_type == "text":
        return load_text_teacher(teacher_name, download_root, need_layers)
    if model_type == "image":
        return load_image_teacher(teacher_name, download_root, need_layers)
    if model_type == "all":
        img_mod, img_vars = load_image_teacher(teacher_name, download_root, need_layers)
        txt_mod, txt_vars = load_text_teacher(teacher_name, download_root, need_layers)
        module = CLIPModel(image_tower=img_mod, text_tower=txt_mod)
        params = {
            "image_tower": img_vars["params"],
            "text_tower": txt_vars["params"],
        }
        return module, {"params": params}
    raise ValueError(f"model_type must be image|text|all, got {model_type}")
