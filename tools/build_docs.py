"""Build the HTML documentation site for ccvm_tpu.

The reference ships a Sphinx tree with API autodoc and class diagrams
(``/root/reference/docs/source/conf.py``, ``diagrams/*.png``).  This
environment has no sphinx/mkdocs, so this is a small self-contained builder
with the same deliverables:

  * every ``docs/*.md`` page (plus README/QUALITY/PARITY) rendered to HTML
    with a navigation sidebar (markdown-it + pygments highlighting);
  * an API reference generated from the package itself with ``inspect``
    (module docstrings, class/function signatures and docstrings — the
    docstrings carry the reference ``file:line`` parity citations);
  * architecture and solver-hierarchy diagrams regenerated from code
    (matplotlib; counterparts of the reference's ``diagrams/*.png``).

Usage:  python tools/build_docs.py   (or ``make docs``)
Output: docs/_build/html/index.html
"""

from __future__ import annotations

import html
import importlib
import inspect
import os
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
OUT = os.path.join(REPO, "docs", "_build", "html")

PAGES = [
    ("index", "README.md", "Overview"),
    ("quality", "QUALITY.md", "Solution quality"),
    ("parity", "PARITY.md", "Reference parity"),
    ("equations", "docs/equations_of_motion.md", "Equations of motion"),
    ("dl_sde", "docs/solvers/dl_ccvm.md", "DL-CCVM"),
    ("mf_sde", "docs/solvers/mf_ccvm.md", "MF-CCVM"),
    ("langevin_sde", "docs/solvers/langevin.md", "Langevin"),
    ("pumped_langevin_sde", "docs/solvers/pumped_langevin.md",
     "Pumped Langevin"),
    ("api_reference", "docs/api_reference.md", "API guide"),
    ("benchmarking", "docs/benchmarking.md", "Benchmarking"),
    ("perf_analysis", "docs/perf_analysis.md", "Performance analysis"),
    ("roadmap", "docs/ROADMAP.md", "Roadmap"),
]

API_MODULES = [
    "ccvm_tpu",
    "ccvm_tpu.solvers.base",
    "ccvm_tpu.solvers.dl",
    "ccvm_tpu.solvers.mf",
    "ccvm_tpu.solvers.langevin",
    "ccvm_tpu.solvers.pumped_langevin",
    "ccvm_tpu.solvers.algorithms",
    "ccvm_tpu.dynamics.common",
    "ccvm_tpu.dynamics.dl",
    "ccvm_tpu.dynamics.mf",
    "ccvm_tpu.dynamics.langevin",
    "ccvm_tpu.dynamics.pumped_langevin",
    "ccvm_tpu.ops.pallas_kernels",
    "ccvm_tpu.ops.lbfgs",
    "ccvm_tpu.parallel.mesh",
    "ccvm_tpu.parallel.tp",
    "ccvm_tpu.parallel.sweep",
    "ccvm_tpu.parallel.multihost",
    "ccvm_tpu.problem_classes.boxqp.problem_instance",
    "ccvm_tpu.post_processor.factory",
    "ccvm_tpu.post_processor.grad_descent",
    "ccvm_tpu.post_processor.adam",
    "ccvm_tpu.post_processor.asgd",
    "ccvm_tpu.post_processor.bfgs",
    "ccvm_tpu.post_processor.lbfgs",
    "ccvm_tpu.solution",
    "ccvm_tpu.metadata",
    "ccvm_tpu.runtime",
    "ccvm_tpu.tuning",
    "ccvm_tpu.checkpoint",
    "ccvm_tpu.profiling",
    "ccvm_tpu.ccvmplotlib.ccvmplotlib",
    "ccvm_tpu.ccvmplotlib.utils.sampleTTSmetric",
]

CSS = """
body { font-family: -apple-system, "Segoe UI", Roboto, sans-serif;
       margin: 0; color: #1a1a1a; line-height: 1.55; }
.layout { display: flex; min-height: 100vh; }
nav { width: 240px; background: #f6f7f9; border-right: 1px solid #e3e5e8;
      padding: 1.2rem .9rem; flex-shrink: 0; }
nav h2 { font-size: .8rem; text-transform: uppercase; letter-spacing: .06em;
         color: #667; margin: 1.1rem 0 .3rem; }
nav a { display: block; color: #234; text-decoration: none;
        padding: .15rem .4rem; border-radius: 4px; font-size: .92rem; }
nav a:hover { background: #e8ebf0; }
nav a.current { background: #dde3ee; font-weight: 600; }
main { flex: 1; max-width: 54rem; padding: 1.5rem 2.5rem 4rem; }
h1, h2, h3 { line-height: 1.25; }
code { background: #f2f3f5; padding: .1em .3em; border-radius: 3px;
       font-size: .9em; }
pre { background: #f6f8fa; border: 1px solid #e3e5e8; border-radius: 6px;
      padding: .8rem 1rem; overflow-x: auto; }
pre code { background: none; padding: 0; }
table { border-collapse: collapse; margin: 1rem 0; font-size: .92rem; }
th, td { border: 1px solid #d8dbe0; padding: .35rem .6rem; text-align: left; }
th { background: #f2f3f5; }
img { max-width: 100%; }
.api-sig { background: #f6f8fa; border-left: 3px solid #8aa;
           padding: .4rem .8rem; font-family: monospace; font-size: .88rem;
           white-space: pre-wrap; margin: .8rem 0 .3rem; }
.api-doc { margin: .2rem 0 1rem 1rem; white-space: pre-wrap;
           font-size: .92rem; color: #333; }
.member { margin-left: 1.2rem; }
"""


def _md():
    from markdown_it import MarkdownIt

    md = MarkdownIt("commonmark", {"html": True}).enable("table")
    try:
        from pygments import highlight
        from pygments.formatters import HtmlFormatter
        from pygments.lexers import get_lexer_by_name

        def hl(code, lang, _attrs):
            if not lang:
                return ""
            try:
                return highlight(code, get_lexer_by_name(lang),
                                 HtmlFormatter(nowrap=True))
            except Exception:
                return ""

        md.options["highlight"] = hl
    except Exception:
        pass
    return md


def _page(title, nav_html, body):
    return f"""<!doctype html><html><head><meta charset="utf-8">
<title>{html.escape(title)} — ccvm_tpu</title>
<style>{CSS}</style></head><body><div class="layout">
<nav><h2>ccvm_tpu</h2>{nav_html}</nav>
<main>{body}</main></div></body></html>"""


def _nav(current, api_names):
    parts = ["<h2>Guide</h2>"]
    for slug, _, title in PAGES:
        cls = ' class="current"' if slug == current else ""
        parts.append(f'<a href="{slug}.html"{cls}>{html.escape(title)}</a>')
    parts.append('<h2>Diagrams</h2><a href="diagrams.html">Architecture</a>')
    parts.append("<h2>API reference</h2>")
    for name in api_names:
        slug = "api_" + name.replace(".", "_")
        cls = ' class="current"' if slug == current else ""
        short = name.replace("ccvm_tpu.", "") if name != "ccvm_tpu" else name
        parts.append(f'<a href="{slug}.html"{cls}>{html.escape(short)}</a>')
    return "\n".join(parts)


def _api_members(mod):
    """(classes, functions) defined in this module, in source order."""
    classes, funcs = [], []
    for name, obj in vars(mod).items():
        if name.startswith("_"):
            continue
        if getattr(obj, "__module__", None) != mod.__name__:
            continue
        if inspect.isclass(obj):
            classes.append((name, obj))
        elif inspect.isfunction(obj):
            funcs.append((name, obj))

    def line(o):
        try:
            return inspect.getsourcelines(o)[1]
        except Exception:
            return 1 << 30

    classes.sort(key=lambda t: line(t[1]))
    funcs.sort(key=lambda t: line(t[1]))
    return classes, funcs


def _sig(obj, name):
    try:
        return f"{name}{inspect.signature(obj)}"
    except (ValueError, TypeError):
        return name


def _doc(obj):
    d = inspect.getdoc(obj) or ""
    return f'<div class="api-doc">{html.escape(d)}</div>' if d else ""


def _api_page_body(mod_name):
    mod = importlib.import_module(mod_name)
    body = [f"<h1><code>{html.escape(mod_name)}</code></h1>", _doc(mod)]
    classes, funcs = _api_members(mod)
    for name, cls in classes:
        body.append(f'<h2 id="{name}">class {html.escape(name)}</h2>')
        body.append(f'<div class="api-sig">class '
                    f"{html.escape(_sig(cls, name))}</div>")
        body.append(_doc(cls))
        for mname, m in inspect.getmembers(cls):
            if mname.startswith("_") and mname != "__call__":
                continue
            if not (inspect.isfunction(m) or isinstance(
                    inspect.getattr_static(cls, mname, None), property)):
                continue
            if inspect.isfunction(m) and m.__qualname__.split(".")[0] != name:
                continue  # inherited; documented on the base class page
            body.append('<div class="member">')
            if isinstance(inspect.getattr_static(cls, mname), property):
                body.append(f'<div class="api-sig">property '
                            f"{html.escape(mname)}</div>")
                body.append(_doc(inspect.getattr_static(cls, mname)))
            else:
                body.append(f'<div class="api-sig">'
                            f"{html.escape(_sig(m, mname))}</div>")
                body.append(_doc(m))
            body.append("</div>")
    for name, fn in funcs:
        body.append(f'<h2 id="{name}">{html.escape(name)}</h2>')
        body.append(f'<div class="api-sig">{html.escape(_sig(fn, name))}</div>')
        body.append(_doc(fn))
    return "\n".join(body)


def build_diagrams(out_dir):
    """Architecture + solver-hierarchy diagrams (reference: diagrams/*.png)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.patches import FancyArrowPatch, FancyBboxPatch

    def box(ax, x, y, w, h, label, fc="#eef1f6", fontsize=9):
        ax.add_patch(FancyBboxPatch(
            (x, y), w, h, boxstyle="round,pad=0.012",
            fc=fc, ec="#5a6b82", lw=1.0))
        ax.text(x + w / 2, y + h / 2, label, ha="center", va="center",
                fontsize=fontsize)

    def arrow(ax, x0, y0, x1, y1):
        ax.add_patch(FancyArrowPatch(
            (x0, y0), (x1, y1), arrowstyle="-|>", mutation_scale=11,
            color="#5a6b82", lw=1.0))

    # ---- architecture: the TPU-native layer map -------------------------
    fig, ax = plt.subplots(figsize=(8.6, 6.4))
    ax.set_xlim(0, 1)
    ax.set_ylim(0, 1)
    ax.axis("off")
    ax.set_title("ccvm_tpu architecture (TPU-native layer map)", fontsize=11)
    rows = [
        (0.88, [("examples / benchmarking_study CLI", 0.02, 0.47),
                ("ccvmplotlib  (TTS/ETS plots, R99 bootstrap)", 0.51, 0.47)]),
        (0.74, [("Solution (f64-exact gap stats)", 0.02, 0.3),
                ("Metadata JSON", 0.34, 0.2),
                ("checkpoint / profiling / tuning", 0.56, 0.42)]),
        (0.60, [("solver facades: DL | MF | Langevin | Pumped  "
                 "(reference-parity API)", 0.02, 0.64),
                ("post_processor (GD/Adam/ASGD/\nvmapped L-BFGS on device)",
                 0.68, 0.30)]),
        (0.46, [("dynamics: pure step fns + lax.scan  (original + Adam)",
                 0.02, 0.47),
                ("parallel: TP engine (shard_map,\npsum_scatter) · "
                 "sweep_solve · multihost", 0.51, 0.47)]),
        (0.32, [("ops.pallas_kernels: fused SDE step kernels  (lane packing,"
                 " hardware PRNG,\nVMEM tile planner, in-kernel Adam, "
                 "stacked instance grid)", 0.02, 0.75),
                ("native C++: .in tokenizer,\nevolution writer", 0.79, 0.19)]),
        (0.18, [("JAX / XLA  (jit, scan, collectives over ICI)", 0.02, 0.47),
                ("problem_classes.boxqp  (parser, mixed-precision readout)",
                 0.51, 0.47)]),
        (0.04, [("TPU hardware: MXU matvec · VPU elementwise · VMEM tiles · "
                 "HBM-resident (batch, N) state", 0.02, 0.96)]),
    ]
    for y, boxes in rows:
        for label, x, w in boxes:
            box(ax, x, y, w, 0.10, label)
    for y in (0.88, 0.74, 0.60, 0.46, 0.32, 0.18):
        arrow(ax, 0.5, y, 0.5, y - 0.04)
    fig.savefig(os.path.join(out_dir, "architecture.png"), dpi=150,
                bbox_inches="tight")
    plt.close(fig)

    # ---- solver hierarchy ----------------------------------------------
    fig, ax = plt.subplots(figsize=(8.6, 4.6))
    ax.set_xlim(0, 1)
    ax.set_ylim(0, 1)
    ax.axis("off")
    ax.set_title("Solver hierarchy and compute paths", fontsize=11)
    box(ax, 0.33, 0.82, 0.34, 0.12,
        "CCVMSolver (base)\nscaling · machine time/energy · mesh/DP",
        fc="#e4ecdf")
    solvers = [("DLSolver", 0.02), ("MFSolver", 0.27),
               ("LangevinSolver", 0.52), ("PumpedLangevinSolver", 0.77)]
    dyn_names = {"DLSolver": "dl", "MFSolver": "mf",
                 "LangevinSolver": "langevin",
                 "PumpedLangevinSolver": "pumped_langevin"}
    for name, x in solvers:
        box(ax, x, 0.55, 0.21, 0.11, name)
        arrow(ax, x + 0.105, 0.66, 0.5, 0.82)
        box(ax, x, 0.33, 0.21, 0.11,
            f"dynamics.{dyn_names[name]}\nstep + Adam step",
            fc="#f6efe2", fontsize=8)
        arrow(ax, x + 0.105, 0.55, x + 0.105, 0.44)
    box(ax, 0.02, 0.06, 0.45, 0.14,
        "ops.pallas_kernels\nfused per-family kernels (orig + Adam +"
        " stacked sweep)", fc="#efe2e6")
    box(ax, 0.52, 0.06, 0.46, 0.14,
        "parallel.tp generic engine\nshard_map DP×TP, psum_scatter matvec",
        fc="#efe2e6")
    for _, x in solvers:
        arrow(ax, x + 0.105, 0.33, 0.245, 0.20)
        arrow(ax, x + 0.105, 0.33, 0.75, 0.20)
    fig.savefig(os.path.join(out_dir, "solver_hierarchy.png"), dpi=150,
                bbox_inches="tight")
    plt.close(fig)


def main():
    # Force CPU so building docs never touches (or wedges) the TPU tunnel.
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    try:
        import jax

        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass

    shutil.rmtree(OUT, ignore_errors=True)
    os.makedirs(OUT, exist_ok=True)
    md = _md()
    api_ok = []
    api_bodies = {}
    for name in API_MODULES:
        try:
            api_bodies[name] = _api_page_body(name)
            api_ok.append(name)
        except Exception as e:  # keep building; report at the end
            print(f"  api: skipped {name}: {e}")

    nav_names = api_ok
    for slug, rel, title in PAGES:
        path = os.path.join(REPO, rel)
        if not os.path.exists(path):
            print(f"  page: missing {rel}, skipped")
            continue
        with open(path) as f:
            body = md.render(f.read())
        with open(os.path.join(OUT, f"{slug}.html"), "w") as f:
            f.write(_page(title, _nav(slug, nav_names), body))
    for name in api_ok:
        slug = "api_" + name.replace(".", "_")
        with open(os.path.join(OUT, f"{slug}.html"), "w") as f:
            f.write(_page(name, _nav(slug, nav_names), api_bodies[name]))

    dia_dir = os.path.join(OUT, "diagrams")
    os.makedirs(dia_dir, exist_ok=True)
    build_diagrams(dia_dir)
    dia_body = (
        "<h1>Diagrams</h1>"
        "<p>Regenerated from code by <code>tools/build_docs.py</code> "
        "(counterparts of the reference's <code>diagrams/*.png</code>).</p>"
        '<h2>Architecture</h2><img src="diagrams/architecture.png">'
        '<h2>Solver hierarchy</h2><img src="diagrams/solver_hierarchy.png">'
    )
    with open(os.path.join(OUT, "diagrams.html"), "w") as f:
        f.write(_page("Diagrams", _nav("diagrams", nav_names), dia_body))

    n_pages = len([p for p in PAGES
                   if os.path.exists(os.path.join(REPO, p[1]))])
    print(f"built {n_pages} guide pages + {len(api_ok)} API pages + "
          f"2 diagrams -> {OUT}/index.html")


if __name__ == "__main__":
    main()
