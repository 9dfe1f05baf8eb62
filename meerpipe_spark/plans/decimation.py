"""Decimation-product DSL (M2).

Reference: the project config ``flags`` list
(configuration_files/project_specific/meertime_jitter.config:19-20), e.g.

    flags = pscrunch, t 320 f 8, t 64 f 16, t 8 f 32, tscrunch, fscrunch

Each comma-separated product describes one decimated output of the same
cleaned archive: ``t N`` = target nsub, ``f N`` = target nchan,
``pscrunch`` = total intensity, ``tscrunch``/``fscrunch`` = collapse the
axis entirely (target 1). Products are independent — the engine emits one
A1 scrunch per product, each grouped directly from the FINEST cleaned
cube rather than chaining coarser-from-coarser (SURVEY.md §4 fusion
note), so products can run in parallel and errors don't cascade.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame

from meerpipe_spark.operators.scrunch import scrunch


@dataclass(frozen=True)
class DecimationSpec:
    name: str
    nsub: int | None = None   # None = keep axis resolution
    nchan: int | None = None
    pscrunch: bool = False

    def factors(self, input_nsub: int, input_nchan: int) -> tuple[int, int]:
        """Integer group sizes for A1. Non-divisible targets round the
        factor down to the nearest divisor-like grouping (ceil semantics:
        last group smaller), matching ``pam --setnsub`` behavior."""
        t = max(1, input_nsub // self.nsub) if self.nsub else 1
        f = max(1, input_nchan // self.nchan) if self.nchan else 1
        return t, f


def parse_decimation_flags(flags: str) -> list[DecimationSpec]:
    specs: list[DecimationSpec] = []
    for raw in flags.split(","):
        prod = raw.strip()
        if not prod:
            continue
        nsub = nchan = None
        pscr = False
        toks = prod.split()
        i = 0
        while i < len(toks):
            tok = toks[i].lower()
            if tok == "pscrunch":
                pscr = True
            elif tok == "tscrunch":
                nsub = 1
            elif tok == "fscrunch":
                nchan = 1
            elif tok == "t" and i + 1 < len(toks):
                nsub = int(toks[i + 1]); i += 1
            elif tok == "f" and i + 1 < len(toks):
                nchan = int(toks[i + 1]); i += 1
            i += 1
        specs.append(DecimationSpec(name=prod.replace(" ", "_"), nsub=nsub, nchan=nchan, pscrunch=pscr))
    return specs


def emit_products(
    cube: DataFrame,
    specs: list[DecimationSpec],
    input_nsub: int,
    input_nchan: int,
) -> dict[str, DataFrame]:
    """One A1 scrunch per product, all from the same (cached) fine cube."""
    out = {}
    for spec in specs:
        t, f = spec.factors(input_nsub, input_nchan)
        out[spec.name] = scrunch(cube, t_factor=t, f_factor=f, pscrunch=spec.pscrunch)
    return out
