"""Stage-batching helpers: run k independent field ops as ONE kernel.

XLA compile time (and TPU launch overhead) scales with the number of field-op
subgraphs, not their width — wide graphs of independent muls compile
pathologically slowly on the CPU backend and waste VPU lanes on TPU. Curve
formulas are therefore written in stages: all muls of a stage are stacked on
a new leading axis and executed as one batched mul, then unstacked.
"""
from __future__ import annotations

import jax.numpy as jnp


def _run(op, xs, ys):
    if len(xs) == 1:
        return (op(xs[0], ys[0]),)
    r = op(jnp.stack(xs), jnp.stack(ys))
    return tuple(r[i] for i in range(len(xs)))


def bmul(f, xs, ys):
    """[x·y for x, y in zip(xs, ys)] as one batched field mul."""
    return _run(f.mul, xs, ys)


def badd(f, xs, ys):
    return _run(f.add, xs, ys)


def bsub(f, xs, ys):
    return _run(f.sub, xs, ys)
