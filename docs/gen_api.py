"""Regenerate docs/API.md from the live package (run from the repo root):

    PYTHONPATH=. python docs/gen_api.py

Counterpart of the reference's sphinx ``docs/api.rst`` — one entry per
public symbol, grouped by module, signature + first docstring line.
"""

import inspect
import os
import re

import jax

jax.config.update("jax_platforms", "cpu")

import tntorch_tpu as tn  # noqa: E402

SECTIONS = [
    ("Core tensor", ["tntorch_tpu.tensor"]),
    ("Constructors", ["tntorch_tpu.create"]),
    ("Rounding & decomposition", ["tntorch_tpu.round", "tntorch_tpu.ops.rounding",
                                  "tntorch_tpu.ops.decomposition"]),
    ("Cross-approximation & optimization", ["tntorch_tpu.cross", "tntorch_tpu.maxvol",
                                            "tntorch_tpu.autodiff"]),
    ("Metrics & statistics", ["tntorch_tpu.metrics"]),
    ("Elementwise ops", ["tntorch_tpu.ops"]),
    ("Array tools", ["tntorch_tpu.tools"]),
    ("Completion, interpolation & learners", ["tntorch_tpu.interpolation",
                                              "tntorch_tpu.models.learners"]),
    ("ANOVA & sensitivity", ["tntorch_tpu.anova"]),
    ("Automata & logic", ["tntorch_tpu.automata", "tntorch_tpu.logic"]),
    ("Vector calculus", ["tntorch_tpu.derivatives"]),
    ("TT/CP matrix operators", ["tntorch_tpu.models.matrix"]),
    ("Serialization & checkpoints", ["tntorch_tpu.serialization"]),
    ("Pallas kernels", ["tntorch_tpu.ops.pallas_tt", "tntorch_tpu.ops.pallas_gram"]),
    ("Utilities & policies", ["tntorch_tpu.utils"]),
]


def _clean_sig(sig):
    """Default-value reprs of callables embed memory addresses; strip them
    so regeneration is reproducible."""
    return re.sub(r"<function (<?\w+>?)[^>]*>", r"\1", sig)


def collect():
    entries = {}
    for name in sorted(dir(tn)):
        if name.startswith("_"):
            continue
        obj = getattr(tn, name)
        if inspect.ismodule(obj) or (not callable(obj) and not inspect.isclass(obj)):
            continue
        mod = getattr(obj, "__module__", "") or ""
        if not mod.startswith("tntorch_tpu"):
            continue  # typing/jax aliases dragged in by star imports
        try:
            if inspect.isclass(obj):
                sig = str(inspect.signature(obj.__init__))
                sig = sig.replace("(self, ", "(").replace("(self)", "()")
            else:
                sig = str(inspect.signature(obj))
        except (TypeError, ValueError):
            sig = "(...)"
        sig = _clean_sig(sig)
        doc = (inspect.getdoc(obj) or "").split("\n")[0]
        entries.setdefault(mod, []).append((name, sig, doc, inspect.isclass(obj)))
    return entries


def main():
    entries = collect()
    out = [
        "# API reference",
        "",
        "Every public symbol in the flat `tn.*` namespace (plus the `tn.parallel`",
        "distribution layer below), grouped by module. Signatures and summaries are",
        "extracted from the live package — regenerate with",
        "`PYTHONPATH=. python docs/gen_api.py`. Docstrings in the source carry",
        "reference citations (`reference <file>:<lines>`) for parity checking and",
        "often measured performance numbers; this file is the quick index.",
        "",
    ]
    seen = set()
    for title, mods in SECTIONS:
        rows = []
        for mod in mods:
            for name, sig, doc, isclass in entries.get(mod, []):
                if name in seen:
                    continue
                seen.add(name)
                kind = "class " if isclass else ""
                rows.append(f"- **`tn.{name}`**{'' if not sig else ''} — {kind}`{name}{sig}`" + (f"\n  {doc}" if doc else ""))
        if rows:
            out.append(f"## {title}\n")
            out.extend(rows)
            out.append("")
    # Anything not claimed by a section
    leftovers = []
    for mod, items in sorted(entries.items()):
        for name, sig, doc, isclass in items:
            if name not in seen:
                leftovers.append(f"- **`tn.{name}`** ({mod}) — `{name}{sig}`" + (f"\n  {doc}" if doc else ""))
    if leftovers:
        out.append("## Other\n")
        out.extend(leftovers)
        out.append("")

    # The parallel layer (not flat-namespace)
    import tntorch_tpu.parallel as par

    out.append("## Distribution layer (`tn.parallel`)\n")
    for name in sorted(dir(par)):
        if name.startswith("_"):
            continue
        obj = getattr(par, name)
        if inspect.ismodule(obj) or not callable(obj):
            continue
        try:
            sig = str(inspect.signature(obj))
        except (TypeError, ValueError):
            sig = "(...)"
        sig = _clean_sig(sig)
        doc = (inspect.getdoc(obj) or "").split("\n")[0]
        out.append(f"- **`tn.parallel.{name}`** — `{name}{sig}`" + (f"\n  {doc}" if doc else ""))
    out.append("")

    path = os.path.join(os.path.dirname(__file__), "API.md")
    with open(path, "w") as f:
        f.write("\n".join(out))
    print(f"wrote {path}: {sum(1 for line in out if line.startswith('- '))} symbols")


if __name__ == "__main__":
    main()
