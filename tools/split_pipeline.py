"""One-shot refactor: split plans/pipeline.py (15k+ LoC) into family
modules with registration semantics preserved bit-for-bit.

Mechanics: parse top-level segments (each constant / helper / @register
query, with its contiguous leading comment block), classify every query
into a family by its leading register() tag, fixpoint-assign each helper
to the one family that references it, then iteratively demote any segment
whose references cross family lines into the shared core (pipeline.py) —
so every emitted module only references itself + the core, in original
source order, and the f-string CTE oracles keep evaluating against
already-defined names.  pipeline.py stays the aggregator: it holds the
shared core and imports the family modules at the bottom, so
`import kwack_spark.plans.pipeline` still registers every query.

Reference detection is done on comment- and docstring-stripped text so
"see multimodal_phash_dedup" prose does not create false dependencies;
string contents are KEPT because genuine dependencies live there
(f-string CTE interpolation, _Q["name"] runtime composition).
"""

from __future__ import annotations

import ast
import re
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
SRC = ROOT / "kwack_spark" / "plans" / "pipeline.py"

FAMILY_BY_FIRST_TAG = {
    "streaming": "streaming",
    "multimodal": "multimodal",
    "dedup": "dedup",
    "decontamination": "dedup",
    "embedding": "embedding",
    "similarity": "embedding",
    "pipeline": "curation",
    "curation": "curation",
    "publish": "curation",
    "sharding": "curation",
    "sampling": "curation",
    "mixture": "curation",
    "text": "text",
    "quality": "text",
    "tokenizer": "text",
}
FAMILIES = [
    "dedup", "multimodal", "streaming", "embedding", "curation", "text",
    "analytics",
]

MODULE_DOC = {
    "dedup": "Dedup family: exact / MinHash-LSH / SimHash / winnowing /"
             " suffix-span / containment dedup and decontamination.",
    "multimodal": "Multimodal family: PNG/JPEG/WAV/MJPEG decode kernels,"
                  " perceptual fingerprints, frame sampling, and the"
                  " image/audio/video near-dup queries.",
    "streaming": "Streaming family: watermarked windows, stateful"
                 " near-dup/sketch kernels, replay-based stream==batch"
                 " checks, and state observability.",
    "embedding": "Embedding family: ANN (brute force / LSH / IVF / PQ),"
                 " semantic dedup, recall gates, and embedding"
                 " diagnostics.",
    "curation": "Curation family: funnel compositions, mixture/temperature"
                " rebalance, shard manifests, splits, and packing.",
    "text": "Text-analysis family: quality scoring, language ID, token"
            " statistics, BPE, and collocation measures.",
    "analytics": "Analytics family: event/EDA measures — funnels, cohorts,"
                 " change points, distribution fits, concentration audits.",
}


def main() -> None:
    src = SRC.read_text()
    lines = src.splitlines(keepends=True)
    tree = ast.parse(src)

    # --- segments -----------------------------------------------------
    segs = []
    for node in tree.body:
        start = node.lineno - 1
        if getattr(node, "decorator_list", None):
            start = min(d.lineno for d in node.decorator_list) - 1
        while start > 0 and lines[start - 1].lstrip().startswith("#"):
            start -= 1
        end = node.end_lineno
        names, qname, tags = [], None, ()
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            names = [node.name]
            for dec in getattr(node, "decorator_list", []):
                if (
                    isinstance(dec, ast.Call)
                    and getattr(dec.func, "id", "") == "register"
                    and dec.args
                ):
                    qname = ast.literal_eval(dec.args[0])
                    for kw in dec.keywords:
                        if kw.arg == "tags":
                            tags = ast.literal_eval(kw.value)
        elif isinstance(node, ast.Assign):
            names = []
            for t in node.targets:
                if isinstance(t, ast.Name):
                    names.append(t.id)
                elif isinstance(t, (ast.Tuple, ast.List)):
                    names.extend(
                        e.id for e in t.elts if isinstance(e, ast.Name)
                    )
        elif isinstance(node, ast.AnnAssign) and isinstance(node.target, ast.Name):
            names = [node.target.id]
        elif isinstance(node, (ast.Import, ast.ImportFrom)):
            names = [a.asname or a.name.split(".")[0] for a in node.names]
        segs.append(
            dict(node=node, names=names, start=start, end=end, qname=qname,
                 tags=tags)
        )

    # header = the CONTIGUOUS prefix of docstring + imports only
    header_end = 0
    for s in segs:
        if isinstance(s["node"], (ast.Import, ast.ImportFrom)) or (
            isinstance(s["node"], ast.Expr) and s["start"] == 0
        ):
            header_end = s["end"]
        else:
            break
    work = [s for s in segs if s["start"] >= header_end]

    # --- texts: emitted verbatim; reference-matching on stripped copy ----
    def stripped(s):
        text_lines = lines[s["start"]:s["end"]]
        out = [
            "" if ln.lstrip().startswith("#") else ln for ln in text_lines
        ]
        node = s["node"]
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)) and (
            node.body
            and isinstance(node.body[0], ast.Expr)
            and isinstance(node.body[0].value, ast.Constant)
            and isinstance(node.body[0].value.value, str)
        ):
            doc = node.body[0]
            for i in range(doc.lineno - 1, doc.end_lineno):
                out[i - s["start"]] = ""
        return "".join(out)

    for s in work:
        s["text"] = "".join(lines[s["start"]:s["end"]])
        s["ref_text"] = stripped(s)
        s["family"] = (
            FAMILY_BY_FIRST_TAG.get(s["tags"][0], "analytics")
            if s["qname"] and s["tags"]
            else ("analytics" if s["qname"] else None)
        )

    name_to_seg = {}
    for s in work:
        for n in s["names"]:
            name_to_seg[n] = s
    pat = {n: re.compile(rf"\b{re.escape(n)}\b") for n in name_to_seg}

    deps = {id(s): set() for s in work}   # segments s references
    rdeps = {id(s): set() for s in work}  # segments referencing s
    by_id = {id(s): s for s in work}
    for s in work:
        for n, target in name_to_seg.items():
            if target is not s and pat[n].search(s["ref_text"]):
                deps[id(s)].add(id(target))
                rdeps[id(target)].add(id(s))

    # --- helper family assignment (fixpoint) ------------------------------
    changed = True
    while changed:
        changed = False
        for s in work:
            if s["qname"]:
                continue
            fams = {by_id[r]["family"] for r in rdeps[id(s)]}
            if not fams and not s["names"]:
                # statement defining nothing: adopt its deps' unique family
                fams = {by_id[d]["family"] for d in deps[id(s)]} - {None}
                new = next(iter(fams)) if len(fams) == 1 else None
            elif None in fams or len(fams) != 1:
                new = None
            else:
                new = next(iter(fams))
            if new != s["family"]:
                s["family"] = new
                changed = True

    # --- conflict demotion: a module may reference only itself + core ----
    changed = True
    while changed:
        changed = False
        for s in work:
            if s["family"] is None:
                continue
            foreign = {
                by_id[d]["family"]
                for d in deps[id(s)]
                if by_id[d]["family"] not in (None, s["family"])
            }
            if foreign:
                print(f"core <- {s['qname'] or s['names']} "
                      f"({s['family']}; refs {sorted(foreign)})")
                s["family"] = None
                changed = True
        for s in work:
            if s["family"] is None:
                continue
            if any(by_id[r]["family"] is None for r in rdeps[id(s)]):
                print(f"core <- {s['qname'] or s['names']} "
                      f"({s['family']}; referenced from core)")
                s["family"] = None
                changed = True

    # --- emit -----------------------------------------------------------
    header = "".join(lines[:header_end])
    import_block = header.split('"""', 2)[2].lstrip("\n")
    core = [s for s in work if s["family"] is None]
    core_names = sorted({n for s in core for n in s["names"]})

    fam_written = []
    for fam in FAMILIES:
        ss = [s for s in work if s["family"] == fam]
        if not ss:
            continue
        used = sorted(
            n for n in core_names
            if any(pat[n].search(s["ref_text"]) for s in ss)
        )
        imp = ""
        if used:
            imp = (
                "from kwack_spark.plans.pipeline import (  # shared core\n"
                + "".join(f"    {n},\n" for n in used)
                + ")\n"
            )
        mod = (
            f'"""{MODULE_DOC[fam]}\n\nSplit out of plans/pipeline.py '
            f'(same registrations, same semantics);\nshared helpers live '
            f'in pipeline.py, the aggregator that imports this\nmodule at '
            f'the bottom.\n"""\n\n'
            + import_block
            + imp
            + "\n\n"
            + "\n\n".join(s["text"].rstrip("\n") for s in ss)
            + "\n"
        )
        path = ROOT / "kwack_spark" / "plans" / f"pipeline_{fam}.py"
        path.write_text(mod)
        fam_written.append(fam)
        nq = sum(1 for s in ss if s["qname"])
        print(f"pipeline_{fam}.py: {len(mod.splitlines())} lines, {nq} queries")

    agg_imports = "".join(
        f"import kwack_spark.plans.pipeline_{f}  # noqa: E402,F401\n"
        for f in fam_written
    )
    core_src = (
        header
        + "\n"
        + "\n\n".join(s["text"].rstrip("\n") for s in core)
        + "\n\n\n"
        + "# family modules register their queries on import; they import\n"
        + "# shared names from THIS module, so they must come last\n"
        + agg_imports
    )
    SRC.write_text(core_src)
    nq = sum(1 for s in core if s["qname"])
    print(f"pipeline.py (core): {len(core_src.splitlines())} lines, {nq} queries")


if __name__ == "__main__":
    main()
