"""Streamlit multipage web app (gated on streamlit availability).

Role parity with the reference's front-end (`app.py` + `pages/1_Chat`,
`2_Dashboard`, `3_Documents`, `4_About`): a chat page with agent/native
toggle, nature filter, enterprise-tag multiselect, depth slider and 👍/👎
feedback; a stats dashboard with alert check; an enterprise-document
management page. Launch: `streamlit run rag_dpo_tpu/app/streamlit_app.py`.

Streamlit is not a baked dependency of this image; the CLI (`app.cli`)
offers the same surfaces in the terminal.
"""

from __future__ import annotations


def _require_streamlit():
    try:
        import streamlit as st  # noqa: F401

        return st
    except ImportError as e:  # pragma: no cover
        raise SystemExit(
            "streamlit n'est pas installé — utilisez le CLI:\n"
            "  python -m rag_dpo_tpu.app.cli chat"
        ) from e


def main():  # pragma: no cover — requires streamlit runtime
    st = _require_streamlit()
    from ..utils import Alerter, QueryLogger, default_paths
    from .demo import build_demo_stack

    st.set_page_config(page_title="RAG-DPO TPU", layout="wide")

    @st.cache_resource
    def init_system():
        native, ctx = build_demo_stack(agent=False)
        agent, _ = build_demo_stack(llm=ctx["llm"], agent=True)
        paths = default_paths().ensure()
        qlog = QueryLogger(paths.queries_log, paths.feedback_log)
        return {"native": native, "agent": agent, "qlog": qlog,
                "alerter": Alerter(qlog, paths.alerts_log)}

    system = init_system()
    page = st.sidebar.radio("Page", ["Chat", "Dashboard", "Documents",
                                     "À propos"])

    if page == "Chat":
        use_agent = st.sidebar.toggle("Pipeline agent", value=True)
        nature = st.sidebar.selectbox(
            "Nature", [None, "DOCTRINE", "GUIDE", "SANCTION", "TECHNIQUE"])
        depth = st.sidebar.select_slider("Profondeur", [5, 8, 12], value=5)
        if "history" not in st.session_state:
            st.session_state.history = []
        for turn in st.session_state.history:
            st.chat_message(turn["role"]).write(turn["content"])
        if q := st.chat_input("Votre question RGPD…"):
            st.chat_message("user").write(q)
            pipe = system["agent"] if use_agent else system["native"]
            resp = pipe.query(
                q, where_filter={"nature": nature} if nature else None,
                conversation_history=st.session_state.history,
                n_documents=depth,
            )
            st.chat_message("assistant").write(resp.answer)
            qid = system["qlog"].log_query(
                resp, pipeline="agent" if use_agent else "native")
            col1, col2 = st.columns(2)
            if col1.button("👍", key=f"up{qid}"):
                system["qlog"].log_feedback(qid, 1)
            if col2.button("👎", key=f"dn{qid}"):
                system["qlog"].log_feedback(qid, -1)
            st.session_state.history += [
                {"role": "user", "content": q},
                {"role": "assistant", "content": resp.answer},
            ]

    elif page == "Dashboard":
        hours = st.slider("Fenêtre (heures)", 1, 720, 24)
        stats = system["qlog"].get_stats(hours * 3600)
        st.json(stats)
        if st.button("Vérifier les alertes"):
            alerts = system["alerter"].check_and_alert()
            for a in alerts:
                st.warning(a["message"])
            if not alerts:
                st.success("Aucune alerte.")
        st.download_button("Exporter JSON", data=str(stats),
                           file_name="stats.json")

    elif page == "Documents":
        st.write("Gestion des documents d'entreprise — voir le CLI "
                 "`python -m rag_dpo_tpu.app.cli docs` pour l'ingestion.")

    else:
        st.markdown(
            "## RAG-DPO TPU\nMoteur de recherche documentaire RGPD "
            "TPU-natif : index dense+lexical sur puce, encodeur BGE-M3 "
            "multi-représentations, agent de validation."
        )


if __name__ == "__main__":  # pragma: no cover
    main()
