"""HPDDM-style CLI option parsing shim.

Reference parity: the reference forwards `-hpddm_*` strings to
`HPDDM::Option::get()->parse` (src/htool/solver/solver.hpp:25-26,63-64);
flags exercised by its tests/examples (tests/test_ddm_solver.py:548-563,
example/use_ddm_solver.py:64-67) are supported here as a dict-backed
registry so test/workflow strings port verbatim.
"""

from __future__ import annotations

DEFAULTS = {
    "krylov_method": "gmres",
    # HPDDM's documented default tolerance (option.hpp registry); ported
    # user scripts that never pass -hpddm_tol get the same stop criterion
    "tol": 1e-6,
    "max_it": 100,
    "gmres_restart": 40,
    "variant": "right",
    "schwarz_method": "none",
    "schwarz_coarse_correction": "none",
    "compute_residual": None,
    "verbosity": 0,
}

_INT_KEYS = {"max_it", "gmres_restart", "verbosity"}
_FLOAT_KEYS = {"tol"}


def parse_hpddm_args(args: str, into: dict | None = None) -> dict:
    """Parse '-hpddm_key value' pairs (flags without values get True)."""
    opts = dict(DEFAULTS) if into is None else into
    tokens = args.split()
    i = 0
    while i < len(tokens):
        tok = tokens[i]
        if tok.startswith("-hpddm_"):
            key = tok[len("-hpddm_"):]
            if i + 1 < len(tokens) and not tokens[i + 1].startswith("-hpddm_"):
                val = tokens[i + 1]
                i += 2
            else:
                val = True
                i += 1
            if key in _INT_KEYS and val is not True:
                val = int(val)
            elif key in _FLOAT_KEYS and val is not True:
                val = float(val)
            opts[key] = val
        else:
            i += 1
    return opts
