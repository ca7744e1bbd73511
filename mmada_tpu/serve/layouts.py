"""XLA layout pinning for serving programs.

XLA picks physical layouts per program; a program whose dots prefer a
transposed weight layout inserts a full re-layout COPY of those weights
on every CALL. Profiled on a standalone block-KV-cached step program
(8B int8, one v5e chip): ~4.2 ms/call of pure `copy` ops on the stacked
q/k/v int8 weights — 21% of the 19.9 ms call. Compiling with AUTO input
layouts and storing the params in the executable's preferred layout
removes them: 19.9 -> 14.5 ms (-27%).

Scope (measured): this matters for MULTI-PROGRAM serving — executables
invoked repeatedly per request (e.g. a per-step/per-block runner run as
its own program). Inside one fused sampler program (the jitted
generate/mmu/t2i scans) XLA hoists the re-layout out of the scan and
amortizes it over all steps, so pinning measured neutral there
(131.4 -> 132.8 tok/s end-to-end cached text — noise).

Usage (the returned executable must be used for the calls — the plain
jit cache compiles for default layouts and would copy the pinned arrays
back):

    compiled, (model, prompt) = compile_with_pinned_layouts(
        lambda m, p: m.generate(p, ..., block_kv_cache=True), model, prompt
    )
    out = compiled(model, prompt)   # the RE-LAID model/prompt, not the originals

The re-layout runs leaf-by-leaf and deletes each original buffer before
materializing the next (double residency of 8 GB params OOMs a 16 GB
chip).
"""

from __future__ import annotations

from typing import Any, Callable

import jax

try:  # JAX >= 0.4.35-ish
    from jax.experimental.layout import Format, Layout

    _AUTO = Format(Layout.AUTO)
except Exception:  # pragma: no cover - older API spelling
    try:
        from jax.experimental.layout import DeviceLocalLayout as _DLL
        from jax.experimental.layout import Layout as Format

        _AUTO = Format(_DLL.AUTO)
    except Exception:  # pragma: no cover
        _AUTO = None


def layouts_supported() -> bool:
    return _AUTO is not None


def _sync(y):
    # block_until_ready does NOT block on the tunneled axon platform (see
    # CLAUDE.md); a host fetch of one element forces completion everywhere
    jax.device_get(y[(0,) * y.ndim] if y.ndim else y)


def _relayout_tree(tree: Any, formats: Any, delete_originals: bool) -> Any:
    leaves, treedef = jax.tree.flatten(tree)
    fmt_leaves = jax.tree.flatten(formats)[0]
    if len(leaves) != len(fmt_leaves):
        raise ValueError(
            f"format tree has {len(fmt_leaves)} leaves for {len(leaves)} arrays"
        )
    out = []
    for x, f in zip(leaves, fmt_leaves):
        y = jax.device_put(x, f)
        if delete_originals:
            _sync(y)
            x.delete()
        out.append(y)
    return jax.tree.unflatten(treedef, out)


def compile_with_pinned_layouts(
    fn: Callable,
    *example_args: Any,
    delete_originals: bool = True,
):
    """Compile `fn(*example_args)` with AUTO input layouts and re-lay every
    input array to the executable's preference.

    Returns `(compiled, pinned_args)` — call `compiled(*pinned_args)` (or
    with fresh small inputs re-laid via `jax.device_put(x, fmt)`). Falls
    back to `(jax.jit(fn), example_args)` when the layout API is absent.
    """
    if _AUTO is None:  # pragma: no cover - depends on JAX version
        return jax.jit(fn), example_args

    autos = jax.tree.map(lambda _: _AUTO, example_args)
    jitted = jax.jit(fn, in_shardings=autos)
    # lower on abstract avals: concrete arrays carry a layout, which AUTO
    # rejects once inputs have already been pinned by a previous program
    abstract = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), example_args
    )
    compiled = jitted.lower(*abstract).compile()
    in_fmt = (compiled.input_formats if hasattr(compiled, "input_formats")
              else compiled.input_layouts)
    # (args, kwargs) pair vs a flat per-arg sequence: detect by the kwargs
    # dict, NOT by len == 2 (a flat tuple for a 2-arg fn also has len 2)
    if (isinstance(in_fmt, tuple) and len(in_fmt) == 2
            and isinstance(in_fmt[1], dict)):
        arg_fmts = in_fmt[0]
    else:
        arg_fmts = in_fmt
    pinned = tuple(
        _relayout_tree(a, f, delete_originals)
        for a, f in zip(example_args, arg_fmts)
    )
    return compiled, pinned
