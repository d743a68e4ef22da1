"""Quality-parity gates: compare eval metrics to published reference numbers.

The reference repo publishes no numbers (results are images,
/root/reference/README.md:12-14; BASELINE.md §"published"); the
authoritative tables live in the DDMI paper (arXiv:2401.12517), which is
not vendored in this zero-egress build environment — so gate VALUES are
user-provided (transcribe them from the paper into the config or
BASELINE.json "published"), while the gate MACHINERY here is complete and
tested: one `mode: eval` run returns a pass/fail parity verdict.

Config shape (data.extra.quality_gates):

    quality_gates:
      fid: {published: 7.25, tol_pct: 2.0}          # lower is better
      cov: {published: 0.55, tol_pct: 2.0, direction: max}   # higher better

A metric passes when it is within tol_pct of the published value in the
favorable direction: `value <= published * (1 + tol)` for `min` metrics,
`value >= published * (1 - tol)` for `max` metrics.  Beating the published
number outright always passes.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

# lower-is-better unless listed here (coverage / precision-recall style)
_MAX_METRICS = {"cov", "coverage", "psnr", "iou", "iou_voxels", "fscore"}


def check_gates(
    results: Mapping[str, float], gates: Mapping[str, Any]
) -> Tuple[bool, Dict[str, Dict[str, Any]]]:
    """Returns (all_passed, per-metric detail).  Raises ValueError on a gate
    whose published value is missing/None (a config error: the config ships
    placeholders — they must be filled from arXiv:2401.12517 before gating
    means anything) or whose `direction` is not 'min'/'max' (a typo would
    otherwise silently invert pass/fail).  A gated metric ABSENT from the
    eval results (e.g. occupancy MMD/COV legitimately skipped when no
    meshes were generated) is a FAILING gate, not an exception — the caller
    still gets its (False, detail) verdict and can write eval.json."""
    detail: Dict[str, Dict[str, Any]] = {}
    ok = True
    for name, spec in gates.items():
        if not isinstance(spec, Mapping):
            spec = {"published": spec}
        published = spec.get("published")
        if published is None:
            raise ValueError(
                f"quality gate '{name}' has no published value — transcribe "
                "it from the DDMI paper (arXiv:2401.12517) into the config; "
                "this build environment cannot fetch it (zero egress)"
            )
        tol = float(spec.get("tol_pct", 2.0)) / 100.0
        direction = spec.get(
            "direction", "max" if name in _MAX_METRICS else "min"
        )
        if direction not in ("min", "max"):
            raise ValueError(
                f"quality gate '{name}': direction must be 'min' or 'max', "
                f"got {direction!r}"
            )
        if name not in results:
            detail[name] = {
                "value": None,
                "published": float(published),
                "tol_pct": tol * 100.0,
                "direction": direction,
                "bound": None,
                "passed": False,
                "reason": (
                    "metric absent from eval results "
                    f"{sorted(results)} — the eval skipped it (e.g. no "
                    "generated meshes) or the domain config is wrong"
                ),
            }
            ok = False
            continue
        value = float(results[name])
        published = float(published)
        if direction == "max":
            bound = published * (1.0 - tol)
            passed = value >= bound
        else:
            bound = published * (1.0 + tol)
            passed = value <= bound
        detail[name] = {
            "value": value,
            "published": published,
            "tol_pct": tol * 100.0,
            "direction": direction,
            "bound": bound,
            "passed": passed,
        }
        ok = ok and passed
    return ok, detail
