"""Computation-graph dumps for a jitted function.

TPU-native analog of the reference's graphviz computation-graph dump
(reference utils/visualize_graph.py — torch autograd-graph walking):
under XLA the authoritative artifacts are the jaxpr (front-end trace)
and the optimized HLO (what actually runs), so this writes both as text
plus an optional graphviz DOT of the jaxpr equation graph.
"""

from __future__ import annotations

import os
from typing import Optional

import jax

__all__ = ["dump_computation_graph"]


def _jaxpr_to_dot(jaxpr) -> str:
    """A compact DOT rendering of the jaxpr equation dependency graph."""
    lines = ["digraph jaxpr {", "  rankdir=TB;",
             '  node [shape=box, fontsize=9];']
    names = {}

    def nm(v):
        if id(v) not in names:
            names[id(v)] = f"v{len(names)}"
        return names[id(v)]

    for i, v in enumerate(jaxpr.jaxpr.invars):
        lines.append(f'  {nm(v)} [label="in{i}", shape=ellipse];')
    for i, eqn in enumerate(jaxpr.jaxpr.eqns):
        en = f"e{i}"
        lines.append(f'  {en} [label="{eqn.primitive.name}"];')
        for v in eqn.invars:
            if hasattr(v, "aval") and id(v) in names:
                lines.append(f"  {nm(v)} -> {en};")
        for v in eqn.outvars:
            lines.append(f"  {en} -> {nm(v)};")
    for i, v in enumerate(jaxpr.jaxpr.outvars):
        if id(v) in names:
            lines.append(
                f'  out{i} [label="out{i}", shape=ellipse];'
                f"  {nm(v)} -> out{i};")
    lines.append("}")
    return "\n".join(lines)


def dump_computation_graph(fn, args, out_dir: str, name: str = "graph",
                           optimized: bool = True,
                           dot: bool = True) -> dict:
    """Write ``<name>.jaxpr.txt`` (+ ``.dot``) and ``<name>.hlo.txt``.

    ``optimized=True`` compiles and dumps the post-optimization HLO (what
    the device executes); False dumps the lowered-but-unoptimized module
    (fast — no compile).  Returns the written paths.
    """
    os.makedirs(out_dir, exist_ok=True)
    written = {}

    jaxpr = jax.make_jaxpr(fn)(*args)
    jp = os.path.join(out_dir, f"{name}.jaxpr.txt")
    with open(jp, "w") as f:
        f.write(jaxpr.pretty_print())
    written["jaxpr"] = jp

    if dot:
        dp = os.path.join(out_dir, f"{name}.dot")
        with open(dp, "w") as f:
            f.write(_jaxpr_to_dot(jaxpr))
        written["dot"] = dp

    lowered = jax.jit(fn).lower(*args)
    if optimized:
        hlo = lowered.compile().as_text()
    else:
        hlo = lowered.as_text()
    hp = os.path.join(out_dir, f"{name}.hlo.txt")
    with open(hp, "w") as f:
        f.write(hlo)
    written["hlo"] = hp
    return written
