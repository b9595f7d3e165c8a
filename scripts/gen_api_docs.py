"""Generate the per-module API reference (docs/api/*.md) from docstrings.

The reference ships Sphinx autodoc pages for every module
(/root/reference/docs/modules/*.rst, built in CI .circleci/config.yml:27-32).
This is the equivalent for gradslam_tpu: every public symbol — module
functions, classes, methods, properties — is emitted with its signature and
docstring into one markdown page per subpackage, plus an index.

Usage:
    python scripts/gen_api_docs.py            # (re)write docs/api/
    python scripts/gen_api_docs.py --check    # CI: fail if stale or if any
                                              # public symbol has no docstring

Run on CPU (imports jax); forces the CPU platform so it never attaches to a
TPU backend.
"""

import argparse
import importlib
import inspect
import os
import sys

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
OUT_DIR = os.path.join(REPO, "docs", "api")

# One page per public subpackage, listing its public modules.
PAGES = {
    "geometry": [
        "gradslam_tpu.geometry.projutils",
        "gradslam_tpu.geometry.geometryutils",
        "gradslam_tpu.geometry.se3utils",
    ],
    "structures": [
        "gradslam_tpu.structures.rgbdimages",
        "gradslam_tpu.structures.pointclouds",
        "gradslam_tpu.structures.structutils",
        "gradslam_tpu.structures.utils",
        "gradslam_tpu.structures.io",
    ],
    "odometry": [
        "gradslam_tpu.odometry.base",
        "gradslam_tpu.odometry.groundtruth",
        "gradslam_tpu.odometry.icp",
        "gradslam_tpu.odometry.gradicp",
        "gradslam_tpu.odometry.icputils",
        "gradslam_tpu.odometry.projective",
    ],
    "slam": [
        "gradslam_tpu.slam.icpslam",
        "gradslam_tpu.slam.pointfusion",
        "gradslam_tpu.slam.fusionutils",
        "gradslam_tpu.slam.health",
        "gradslam_tpu.slam.relocalize",
    ],
    "ops": [
        "gradslam_tpu.ops",
        "gradslam_tpu.ops.knn",
        "gradslam_tpu.ops.knn_pallas",
    ],
    "datasets": [
        "gradslam_tpu.datasets.tum",
        "gradslam_tpu.datasets.icl",
        "gradslam_tpu.datasets.scannet",
        "gradslam_tpu.datasets.synthetic",
        "gradslam_tpu.datasets.datautils",
        "gradslam_tpu.datasets.tumutils",
        "gradslam_tpu.datasets.frameio",
    ],
    "metrics": [
        "gradslam_tpu.metrics.trajectory",
        "gradslam_tpu.metrics.pointcloud",
    ],
    "parallel": [
        "gradslam_tpu.parallel.sharding",
        "gradslam_tpu.parallel.map_sharded",
    ],
    "config": [
        "gradslam_tpu.config.cfgnode",
    ],
    "utils": [
        "gradslam_tpu.utils.checkpoint",
        "gradslam_tpu.utils.profiling",
        "gradslam_tpu.utils.precision",
        "gradslam_tpu.utils.trajectory_io",
    ],
}


def _public_names(mod):
    if hasattr(mod, "__all__"):
        return list(mod.__all__)
    return [
        n
        for n, obj in vars(mod).items()
        if not n.startswith("_")
        and getattr(obj, "__module__", None) == mod.__name__
        and (inspect.isfunction(obj) or inspect.isclass(obj))
    ]


def _signature(obj):
    try:
        return str(inspect.signature(obj))
    except (ValueError, TypeError):
        return "(...)"


def _doc(obj):
    return inspect.getdoc(obj) or ""


def _indent_doc(doc):
    """Docstring as a markdown blockquote-free body, fenced at headings."""
    return doc.strip()


def _emit_function(lines, name, obj, missing, qualname, level="###"):
    lines.append(f"{level} `{name}{_signature(obj)}`")
    lines.append("")
    doc = _doc(obj)
    if doc:
        lines.append(_indent_doc(doc))
    else:
        missing.append(qualname)
    lines.append("")


def _emit_class(lines, name, cls, missing, modname):
    lines.append(f"### class `{name}{_signature(cls)}`")
    lines.append("")
    doc = _doc(cls)
    if doc:
        lines.append(_indent_doc(doc))
    else:
        missing.append(f"{modname}.{name}")
    lines.append("")
    members = []
    for attr, obj in sorted(vars(cls).items()):
        if attr.startswith("_"):
            continue
        if isinstance(obj, property):
            members.append(("property", attr, obj.fget))
        elif isinstance(obj, (staticmethod, classmethod)):
            members.append(("method", attr, obj.__func__))
        elif inspect.isfunction(obj):
            members.append(("method", attr, obj))
    for kind, attr, fn in members:
        qual = f"{modname}.{name}.{attr}"
        if kind == "property":
            lines.append(f"#### `{name}.{attr}` *(property)*")
            lines.append("")
            doc = _doc(fn) if fn else ""
            if doc:
                lines.append(_indent_doc(doc))
            else:
                missing.append(qual)
            lines.append("")
        else:
            _emit_function(
                lines, f"{name}.{attr}", fn, missing, qual, level="####"
            )


def generate():
    """Returns ({page_name: markdown}, [qualnames missing docstrings])."""
    pages = {}
    missing = []
    for page, modules in PAGES.items():
        lines = [f"# gradslam_tpu.{page}", ""]
        modnames = set(modules)
        for modname in modules:
            mod = importlib.import_module(modname)
            lines.append(f"## {modname}")
            lines.append("")
            moddoc = _doc(mod)
            if moddoc:
                lines.append(_indent_doc(moddoc))
            else:
                missing.append(modname)
            lines.append("")
            for symname in _public_names(mod):
                obj = getattr(mod, symname, None)
                if obj is None:
                    continue
                # Skip re-exports whose defining module is also on this page
                # (e.g. gradslam_tpu.ops re-exports the knn symbols) — they
                # would be documented twice.
                defmod = getattr(obj, "__module__", None)
                if defmod and defmod != mod.__name__ and defmod in modnames:
                    continue
                if inspect.isclass(obj):
                    _emit_class(lines, symname, obj, missing, modname)
                elif callable(obj):
                    _emit_function(
                        lines, symname, obj, missing, f"{modname}.{symname}"
                    )
                else:  # constants
                    lines.append(f"### `{symname}`")
                    lines.append("")
        pages[page] = "\n".join(lines).rstrip() + "\n"

    index = [
        "# gradslam_tpu API reference",
        "",
        "Generated from docstrings by `scripts/gen_api_docs.py` (the",
        "reference builds the analogous pages with Sphinx autodoc,",
        "`/root/reference/docs/modules/*.rst`). Regenerate after changing any",
        "public signature or docstring; CI checks staleness.",
        "",
    ]
    for page in PAGES:
        index.append(f"- [gradslam_tpu.{page}]({page}.md)")
    index.append("")
    pages["index"] = "\n".join(index)
    return pages, missing


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true")
    args = ap.parse_args()

    pages, missing = generate()
    if args.check:
        ok = True
        if missing:
            ok = False
            print("public symbols with no docstring:")
            for m in missing:
                print(f"  {m}")
        for page, content in pages.items():
            path = os.path.join(OUT_DIR, f"{page}.md")
            on_disk = open(path).read() if os.path.exists(path) else None
            if on_disk != content:
                ok = False
                print(f"stale or missing: docs/api/{page}.md "
                      "(run scripts/gen_api_docs.py)")
        sys.exit(0 if ok else 1)

    os.makedirs(OUT_DIR, exist_ok=True)
    for page, content in pages.items():
        with open(os.path.join(OUT_DIR, f"{page}.md"), "w") as f:
            f.write(content)
    n_syms = sum(p.count("\n### ") + p.count("\n#### ") for p in pages.values())
    print(f"wrote {len(pages)} pages, ~{n_syms} documented entries -> {OUT_DIR}")
    if missing:
        print(f"WARNING: {len(missing)} public symbols lack docstrings:")
        for m in missing:
            print(f"  {m}")


if __name__ == "__main__":
    sys.path.insert(0, REPO)
    import jax

    jax.config.update("jax_platforms", "cpu")
    main()
