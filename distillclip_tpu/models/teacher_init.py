"""Teacher-weight warm-start for plain (CLIP-architecture) students.

Reference: ImageEncoder.init_layers_with_teacher (image_encoder.py:70-97)
and TextEncoder.init_layers_with_teacher (text_encoder.py:124-152): copy
teacher weights into a student with fewer layers, remapping block indices
by an ``init_type``:

* ``begin``: student block i <- teacher block i
* ``end``:   student block i <- teacher block (tea_n - stu_n + i)
* ``mid``:   student block i <- teacher block (i * step)

Non-block parameters present in both trees are copied directly (the
reference's regex walk over state_dict keys becomes a pytree walk).
"""

from __future__ import annotations

from typing import Any, Dict, Optional


def _map_layer(init_type: str, stu_n: int, tea_n: int, step: Optional[int] = None):
    if init_type == "begin":
        return lambda i: i
    if init_type == "end":
        return lambda i: tea_n - stu_n + i
    if init_type == "mid":
        s = step if step is not None else max(1, tea_n // stu_n)
        return lambda i: i * s
    raise ValueError(
        f"the init_type should be begin, end, and mid, but got {init_type}"
    )


def _copy_matching(dst: Dict[str, Any], src: Dict[str, Any]) -> Dict[str, Any]:
    """Copy leaves present in both trees with matching shapes."""
    out = {}
    for k, v in dst.items():
        if k in src:
            if isinstance(v, dict) and isinstance(src[k], dict):
                out[k] = _copy_matching(v, src[k])
            elif not isinstance(v, dict) and getattr(v, "shape", None) == getattr(
                src[k], "shape", None
            ):
                out[k] = src[k]
            else:
                out[k] = v
        else:
            out[k] = v
    return out


def init_layers_with_teacher(
    student_tower: Dict[str, Any],
    teacher_tower: Dict[str, Any],
    init_type: Optional[str],
    step: Optional[int] = None,
) -> Dict[str, Any]:
    """Warm-start one tower's param tree (the 'visual' or 'text' scope).

    ``student_tower``/``teacher_tower`` hold a ``transformer`` subtree with
    ``resblocks_{i}`` children (plain CLIP architecture).  Returns a new
    student tree; shapes must match (same width), layer counts may differ.
    """
    if init_type is None:
        return student_tower

    stu_tr = student_tower["transformer"]
    tea_tr = teacher_tower["transformer"]
    stu_n = len([k for k in stu_tr if k.startswith("resblocks_")])
    tea_n = len([k for k in tea_tr if k.startswith("resblocks_")])
    mapper = _map_layer(init_type, stu_n, tea_n, step)

    out = _copy_matching(student_tower, teacher_tower)
    new_tr = dict(out["transformer"])
    for i in range(stu_n):
        tea_idx = mapper(i)
        if not 0 <= tea_idx < tea_n:
            raise ValueError(f"mapped teacher layer {tea_idx} out of range [0,{tea_n})")
        new_tr[f"resblocks_{i}"] = _copy_matching(
            stu_tr[f"resblocks_{i}"], tea_tr[f"resblocks_{tea_idx}"]
        )
    out["transformer"] = new_tr
    return out
