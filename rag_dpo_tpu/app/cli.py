"""Terminal application: chat, dashboard, documents, eval subcommands.

The reference front-end is a Streamlit multipage app (app.py + pages/ —
chat with agent toggle and filters, analytics dashboard, enterprise
document management). Streamlit is not part of this image's baked deps, so
the first-class front-end here is a terminal CLI exposing the same four
surfaces; `rag_dpo_tpu.app.streamlit_app` provides the web variant when
streamlit is installed.

    python -m rag_dpo_tpu.app.cli chat [--agent] [--nature GUIDE] …
    python -m rag_dpo_tpu.app.cli dashboard [--window-hours 24]
    python -m rag_dpo_tpu.app.cli docs list|ingest|purge …
    python -m rag_dpo_tpu.app.cli eval [--runs N] [--judge]
"""

from __future__ import annotations

import argparse
import json
import sys


def _stack(args):
    from ..providers import FakeLLMProvider, HTTPLLMProvider

    llm = None
    if getattr(args, "llm", None):
        p = HTTPLLMProvider(base_url=args.llm)
        llm = p if p.is_available() else None
    llm = llm or FakeLLMProvider()

    # production path: a saved index checkpoint + unified config
    from ..bootstrap import try_build_stack
    from ..utils.paths import default_paths

    paths = default_paths(getattr(args, "root", None))
    stack = try_build_stack(paths, llm=llm,
                            config_path=getattr(args, "config", None))
    if stack is not None:
        pipe = stack.active(use_agent=getattr(args, "agent", False))
        return pipe, {
            "index": stack.index, "embedder": stack.embedder,
            "bm25_stats": stack.bm25_stats, "llm": stack.llm,
        }

    from .demo import build_demo_stack

    return build_demo_stack(llm=llm, agent=getattr(args, "agent", False))


def cmd_chat(args) -> int:
    from ..utils import QueryLogger, default_paths

    pipe, ctx = _stack(args)
    paths = default_paths().ensure()
    qlog = QueryLogger(paths.queries_log, paths.feedback_log)
    history: list[dict] = []
    where = {"nature": args.nature} if args.nature else None
    tags = args.tags.split(",") if args.tags else None
    print("Chat RGPD — question vide pour quitter. "
          "('+1'/'-1' pour noter la dernière réponse)")
    last_qid = None
    while True:
        try:
            q = input("\nvous> ").strip()
        except (EOFError, KeyboardInterrupt):
            break
        if not q:
            break
        if q in ("+1", "-1") and last_qid:
            qlog.log_feedback(last_qid, 1 if q == "+1" else -1)
            print("merci pour le retour.")
            continue
        kwargs = dict(where_filter=where, enterprise_tags=tags,
                      conversation_history=history,
                      n_documents=args.depth)
        if getattr(args, "no_stream", False) \
                or not hasattr(pipe, "query_stream"):
            resp = pipe.query(q, **kwargs)
            print(f"\nassistant> {resp.answer}")
        else:
            # stream the draft as the LLM produces it, then replace it
            # with the post-processed (renumbered-citation) final answer
            print("\nassistant> ", end="", flush=True)
            resp = None
            for ev, val in pipe.query_stream(q, **kwargs):
                if ev == "delta":
                    print(val, end="", flush=True)
                elif ev == "reset":
                    print("\n  [nouvelle tentative]\nassistant> ",
                          end="", flush=True)
                elif ev == "response":
                    resp = val
            if resp.answer != "":
                print(f"\n--- réponse finale (sources renumérotées) ---"
                      f"\n{resp.answer}")
        print(f"  [{resp.intent} · {len(resp.sources)} sources · "
              f"{resp.total_time:.2f}s]")
        last_qid = qlog.log_query(
            resp, pipeline="agent" if args.agent else "native"
        )
        history += [{"role": "user", "content": q},
                    {"role": "assistant", "content": resp.answer[:500]}]
        history = history[-10:]
    return 0


def cmd_dashboard(args) -> int:
    from ..utils import Alerter, QueryLogger, default_paths

    paths = default_paths()
    qlog = QueryLogger(paths.queries_log, paths.feedback_log)
    window = args.window_hours * 3600
    stats = qlog.get_stats(window)
    print(json.dumps(stats, ensure_ascii=False, indent=2))
    alerts = Alerter(qlog, paths.alerts_log).check()
    if alerts:
        print("\nALERTES:")
        for a in alerts:
            print(f"  ⚠️  {a['message']}")
    if args.export:
        with open(args.export, "w") as f:
            json.dump({"stats": stats, "alerts": alerts}, f,
                      ensure_ascii=False, indent=2)
        print(f"\nexporté → {args.export}")
    return 0


def cmd_docs(args) -> int:
    from ..ingest.enterprise import EnterpriseIngestor, TagRegistry
    from ..utils import default_paths

    pipe, ctx = _stack(args)
    paths = default_paths().ensure()
    ing = EnterpriseIngestor(
        ctx["index"], ctx["embedder"], ctx["bm25_stats"],
        TagRegistry(paths.enterprise_tags),
    )
    if args.action == "list":
        for d in ing.list_documents():
            print(f"{d['doc_id']}  {d['title']}  "
                  f"({d['n_chunks']} chunks, tags: {d['tags']})")
    elif args.action == "stats":
        print(json.dumps(ing.stats(), ensure_ascii=False, indent=2))
    elif args.action == "ingest":
        if not args.file:
            print("--file requis", file=sys.stderr)
            return 2
        out = ing.ingest(args.file, args.tags.split(",") if args.tags
                         else [])
        print(json.dumps(out, ensure_ascii=False))
    elif args.action == "purge":
        n = ing.purge(args.doc_id)
        print(f"{n} chunks supprimés")
    return 0


def cmd_eval(args) -> int:
    from ..evals import EvalConfig, EvalHarness, load_qa_dataset
    from ..utils import default_paths

    pipe, ctx = _stack(args)
    dataset = load_qa_dataset(args.dataset)
    if args.limit:
        dataset = dataset[: args.limit]
    harness = EvalHarness(
        pipe, embedder=ctx["embedder"],
        judge_llm=ctx["llm"] if args.judge else None,
        config=EvalConfig(use_llm_judge=args.judge),
    )
    if args.runs > 1:
        report = harness.run_multi(dataset, n_runs=args.runs)
        print(f"score global: {report['global_score']['mean']:.3f} "
              f"± {report['global_score']['std']:.3f}")
    else:
        report = harness.run(dataset)
        print(f"score global: {report['global_score']:.3f} "
              f"({report['questions_above_85pct']}/{report['n_questions']}"
              f" ≥85%)")
    out = harness.save_report(report, default_paths().eval_dir,
                              tag="agent" if args.agent else "native")
    print(f"rapport → {out}")
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="rag-dpo-tpu")
    ap.add_argument("--llm", help="endpoint Ollama-compatible")
    ap.add_argument("--tpu", action="store_true",
                    help="backend TPU (défaut: CPU pour la démo)")
    ap.add_argument("--root", help="racine data/ (index réel si présent)")
    ap.add_argument("--config", help="fichier de configuration yaml/json")
    sub = ap.add_subparsers(dest="cmd", required=True)

    chat = sub.add_parser("chat")
    chat.add_argument("--agent", action="store_true")
    chat.add_argument("--nature", choices=["DOCTRINE", "GUIDE", "SANCTION",
                                           "TECHNIQUE", "MIXTE"])
    chat.add_argument("--tags", help="tags entreprise séparés par ,")
    chat.add_argument("--depth", type=int, default=5,
                      help="n_documents (5/8/12)")
    chat.add_argument("--no-stream", dest="no_stream",
                      action="store_true",
                      help="réponse d'un bloc (pas de streaming)")
    chat.set_defaults(fn=cmd_chat)

    dash = sub.add_parser("dashboard")
    dash.add_argument("--window-hours", type=float, default=24)
    dash.add_argument("--export")
    dash.set_defaults(fn=cmd_dashboard, agent=False)

    docs = sub.add_parser("docs")
    docs.add_argument("action", choices=["list", "ingest", "purge",
                                         "stats"])
    docs.add_argument("--file")
    docs.add_argument("--tags")
    docs.add_argument("--doc-id")
    docs.set_defaults(fn=cmd_docs, agent=False)

    ev = sub.add_parser("eval")
    ev.add_argument("--agent", action="store_true")
    ev.add_argument("--judge", action="store_true")
    ev.add_argument("--runs", type=int, default=1)
    ev.add_argument("--limit", type=int)
    ev.add_argument("--dataset")
    ev.set_defaults(fn=cmd_eval)

    args = ap.parse_args(argv)
    if not args.tpu:
        import os

        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
