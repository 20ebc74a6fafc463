#!/usr/bin/env python
"""API-reference generator: walks the public package and emits
docs/api_reference.md from live docstrings.

The TPU-native analog of the reference's Sphinx+Doxygen+breathe pipeline
(/root/reference/docs/conf.py, docs/generate_docs.sh, the build-docs
workflow): one dependency-free script (Sphinx is not installed in this
environment) that keeps the API reference generated-from-source rather
than hand-written. Run: python docs/generate_api_docs.py
CI runs it and fails if the checked-in file is stale.
"""

import importlib
import inspect
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

MODULES = [
    "flatnav_tpu",
    "flatnav_tpu.index.api",
    "flatnav_tpu.index.search",
    "flatnav_tpu.index.build",
    "flatnav_tpu.index.graph",
    "flatnav_tpu.index.serialize",
    "flatnav_tpu.ops.distances",
    "flatnav_tpu.ops.gather_distance",
    "flatnav_tpu.quantization.pq",
    "flatnav_tpu.quantization.pq_index",
    "flatnav_tpu.quantization.kmeans",
    "flatnav_tpu.parallel.sharding",
    "flatnav_tpu.parallel.sharded_graph",
    "flatnav_tpu.parallel.sharded_exact",
    "flatnav_tpu.parallel.sharded_search",
    "flatnav_tpu.reorder",
    "flatnav_tpu.data_type",
    "flatnav_tpu.utils.profiling",
    "flatnav_tpu.bench.run_benchmark",
    "flatnav_tpu.bench.metrics",
    "flatnav_tpu.bench.data_loader",
]


def _doc(obj) -> str:
    d = inspect.getdoc(obj)
    return d.strip() if d else "*(undocumented)*"


def _sig(obj) -> str:
    try:
        return str(inspect.signature(obj))
    except (ValueError, TypeError):
        return "(...)"


def _is_public_member(mod, name, obj):
    if name.startswith("_"):
        return False
    return getattr(obj, "__module__", None) == mod.__name__


def render() -> str:
    out = [
        "# flatnav-tpu API reference",
        "",
        "*Generated from docstrings by `docs/generate_api_docs.py` — do "
        "not edit by hand. Reference citations (`file:line`) point into "
        "the FlatNav C++ reference this framework re-implements "
        "TPU-natively.*",
        "",
    ]
    for modname in MODULES:
        mod = importlib.import_module(modname)
        out += [f"## `{modname}`", "", _doc(mod), ""]
        for name, obj in sorted(vars(mod).items()):
            if not _is_public_member(mod, name, obj):
                continue
            if inspect.isclass(obj):
                out += [f"### class `{name}`", "", _doc(obj), ""]
                for mname, meth in sorted(vars(obj).items()):
                    if mname.startswith("_") or not (
                        inspect.isfunction(meth)
                        or isinstance(meth, (property, classmethod,
                                             staticmethod))
                    ):
                        continue
                    if isinstance(meth, property):
                        out += [f"#### `{name}.{mname}` *(property)*", "",
                                _doc(meth), ""]
                    else:
                        fn = (
                            meth.__func__
                            if isinstance(meth, (classmethod, staticmethod))
                            else meth
                        )
                        out += [f"#### `{name}.{mname}{_sig(fn)}`", "",
                                _doc(fn), ""]
            elif inspect.isfunction(obj):
                out += [f"### `{name}{_sig(obj)}`", "", _doc(obj), ""]
    return "\n".join(out) + "\n"


def main():
    path = os.path.join(_REPO, "docs", "api_reference.md")
    text = render()
    if "--check" in sys.argv:
        with open(path) as f:
            if f.read() != text:
                print("docs/api_reference.md is stale; re-run "
                      "python docs/generate_api_docs.py", file=sys.stderr)
                raise SystemExit(1)
        print("api_reference.md up to date")
        return
    with open(path, "w") as f:
        f.write(text)
    print(f"wrote {path} ({len(text.splitlines())} lines)")


if __name__ == "__main__":
    main()
