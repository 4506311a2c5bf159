"""QA-replay evaluation harness.

Role parity with `eval/run_eval.py` (1425 LoC): replays the 48-question
`eval/qa_dataset.json` (schema: id, question, category, difficulty,
expected_answer_summary, must_include, must_include_any, must_not_include,
expected_sources_keywords, reference_articles) and scores along the
reference's axes:

* keyword correctness — flexible accent-insensitive matching with
  `must_include`, N-of-M `must_include_any` with `|`-alternates, and
  `must_not_include` veto (reference :71-256)
* semantic similarity — embedder cosine(expected_summary, answer)
  (reference :380-404 uses BGE-M3 the same way)
* LLM-judge — free 0-100 with factual-error veto (reference :426-563);
  optional, two-phase (all RAG answers first, judging after — the
  reference does this for GPU handoff :922-925)
* source quality — cited sources vs expected_sources_keywords (:317-359)
* combination — correctness = 0.60·judge + 0.40·semantic when the judge
  is on (else keyword+semantic mix); global = 0.55·correctness +
  0.25·faithfulness + 0.20·sources (:623-686)
* multi-run mean±σ aggregation with per-question spread flags (:1125-1373)
"""

from __future__ import annotations

import dataclasses
import json
import pathlib
import re
import statistics
import time
import unicodedata
from typing import Any, Sequence

from ..rag.intent import extract_json_object
from ..rag.validators import extract_citations

# Vendored copy of the 48-question CNIL benchmark (data, not code) — the
# framework is self-contained; no reference checkout required.
DEFAULT_DATASET = (pathlib.Path(__file__).resolve().parent / "data"
                   / "qa_dataset.json")


def _norm(text: str) -> str:
    text = unicodedata.normalize("NFKD", text.lower())
    return "".join(c for c in text if not unicodedata.combining(c))


def load_qa_dataset(path=None) -> list[dict]:
    p = pathlib.Path(path) if path else DEFAULT_DATASET
    if not p.exists():
        raise FileNotFoundError(
            f"QA dataset not found at {p} — pass an explicit path "
            "(the default is the vendored copy shipped with the package)"
        )
    with open(p, encoding="utf-8") as f:
        return json.load(f)


# ------------------------------------------------------------------ scoring

def keyword_found(keyword: str, answer_norm: str) -> bool:
    """Flexible match: all words of the keyword phrase appear (any order,
    accent-insensitive) or the full phrase appears."""
    kw = _norm(keyword)
    if kw in answer_norm:
        return True
    words = [w for w in re.findall(r"\w+", kw) if len(w) > 2]
    return bool(words) and all(w in answer_norm for w in words)


def _alts_found(item_str: str, answer_norm: str) -> bool:
    """One keyword item, possibly with |-separated alternates
    (reference `_match_item_or_alternates`, run_eval.py:173-228)."""
    return any(keyword_found(alt, answer_norm)
               for alt in item_str.split("|"))


def keyword_score(item: dict, answer: str) -> tuple[float, list[str]]:
    """→ (score 0-1, missing keywords). must_not_include is a veto.

    `must_include` is AND (fraction found). `must_include_any` is the
    dataset's N-of-M dict {"min_count": N, "items": [...]} — each item
    may carry |-alternates; full credit at ≥N matches, n/N partial
    credit below (reference run_eval.py:205-228). The two modes
    average (run_eval.py:230-233). Legacy group forms (a list of
    "a|b" strings or {"any": [...], "min": n} dicts) score as
    one 0/1 check each."""
    answer_norm = _norm(answer)
    missing: list[str] = []
    scores: list[float] = []
    must = item.get("must_include") or []
    if must:
        n_hit = 0
        for kw in must:
            if _alts_found(kw, answer_norm):
                n_hit += 1
            else:
                missing.append(kw)
        scores.append(n_hit / len(must))
    any_spec = item.get("must_include_any")
    if isinstance(any_spec, dict):
        alts = any_spec.get("items", [])
        need = int(any_spec.get("min_count", 1))
        hits = sum(1 for a in alts if _alts_found(a, answer_norm))
        scores.append(1.0 if hits >= need else hits / max(need, 1))
        if hits < need:
            missing.append(f"[any: {hits}/{need} trouvés parmi "
                           f"{len(alts)}]")
    elif any_spec:
        for group in any_spec:
            # group is "a|b|c" or {"any": [...], "min": n}
            if isinstance(group, str):
                galts, need = group.split("|"), 1
            else:
                galts = group.get("any", [])
                need = int(group.get("min", 1))
            hits = sum(1 for alt in galts
                       if keyword_found(alt, answer_norm))
            scores.append(1.0 if hits >= need else 0.0)
            if hits < need:
                missing.append(str(group))
    score = sum(scores) / len(scores) if scores else 1.0
    for kw in item.get("must_not_include") or []:
        # STRICT substring for forbidden content (reference
        # run_eval.py:246-249): flexible word matching would veto an
        # answer for containing "50 ans" and "autorisé" in two
        # unrelated sentences — negations must match the exact phrase
        if _norm(kw) in answer_norm:
            score *= 0.3  # forbidden content veto
            missing.append(f"INTERDIT:{kw}")
    return score, missing


def source_quality_score(item: dict, sources: list[dict],
                         answer: str) -> float:
    expected = item.get("expected_sources_keywords") or []
    if not expected:
        return 1.0 if sources or not extract_citations(answer) else 0.5
    if not sources:
        return 0.0
    blob = _norm(" ".join(
        f"{s.get('title', '')} {s.get('url', '')}" for s in sources
    ) + " " + answer)
    hits = sum(1 for kw in expected if keyword_found(kw, blob))
    return hits / len(expected)


# Conciseness (traced axis — reported per question, NOT folded into the
# global score, matching the reference's treatment of
# `eval/run_eval.py:259-314`). Word budgets depend on the question
# category; the classified intent scales them, because structured
# formats (méthodologie = steps + actors + deliverables) are legitimately
# longer — that's the requested format, not verbosity.
_CONCISENESS_BUDGETS = {
    # category: (ideal, soft_max, hard_max) in words
    "definition": (150, 400, 600),
    "obligation": (200, 500, 800),
    "recommandation": (200, 500, 800),
    "piège": (80, 250, 400),
    "hors_perimetre": (50, 150, 300),
}
_INTENT_LENGTH_FACTOR = {
    "factuel": 1.0,
    "methodologique": 1.6,
    "organisationnel": 1.4,
    "comparaison": 1.3,
    "cas_pratique": 1.4,
    "liste_exhaustive": 1.5,
    "refus": 0.3,
}


def conciseness_score(answer: str, category: str | None,
                      intent: str = "factuel") -> tuple[float, str]:
    """→ (score 0-1, human-readable assessment)."""
    words = len(answer.split())
    ideal, soft, hard = _CONCISENESS_BUDGETS.get(
        category or "", (200, 500, 800))
    factor = _INTENT_LENGTH_FACTOR.get(intent, 1.0)
    ideal, soft, hard = (int(ideal * factor), int(soft * factor),
                         int(hard * factor))
    if words <= ideal:
        return 1.0, f"ok: {words} mots (idéal ≤{ideal})"
    if words <= soft:
        frac = (words - ideal) / max(soft - ideal, 1)
        return round(1.0 - 0.3 * frac, 4), \
            f"long: {words} mots (idéal ≤{ideal}, souple ≤{soft})"
    if words <= hard:
        frac = (words - soft) / max(hard - soft, 1)
        return round(0.7 - 0.3 * frac, 4), \
            f"trop long: {words} mots (souple ≤{soft}, dur ≤{hard})"
    return 0.3, f"excessif: {words} mots (dur ≤{hard})"


JUDGE_PROMPT = """Tu évalues la réponse d'un assistant RGPD.

Question : {question}

Réponse attendue (résumé) : {expected}

Réponse de l'assistant :
{answer}

Note la justesse de 0 à 100 (100 = parfaitement correcte et complète).
Signale toute erreur factuelle (chiffre, délai, article faux).
Réponds STRICTEMENT en JSON :
{{"score": <0-100>, "erreur_factuelle": <true|false>,
"justification": "<une phrase>"}}

JSON :"""


def llm_judge_score(llm, item: dict, answer: str) -> float | None:
    resp = llm.generate(
        JUDGE_PROMPT.format(
            question=item["question"],
            expected=item.get("expected_answer_summary", ""),
            answer=answer[:6000],
        ),
        temperature=0.0, json_mode=True,
    )
    if not resp.ok:
        return None
    data = extract_json_object(resp.text)
    if not isinstance(data, dict) or "score" not in data:
        return None
    try:
        score = float(data["score"]) / 100.0
    except (TypeError, ValueError):
        return None
    if data.get("erreur_factuelle"):
        score = min(score, 0.4)  # factual-error veto
    return max(0.0, min(1.0, score))


JUDGE_CHOOSE_PROMPT = """Tu évalues la réponse d'un assistant RGPD.

Question : {question}

Réponse attendue (résumé) : {expected}

Réponse de l'assistant :
{answer}

Note la justesse de 0 à 100 (100 = parfaitement correcte et complète).
Note :"""

JUDGE_VETO_PROMPT = """Tu évalues la réponse d'un assistant RGPD.

Question : {question}

Réponse attendue (résumé) : {expected}

Réponse de l'assistant :
{answer}

La réponse contient-elle une erreur factuelle (chiffre, délai, numéro
d'article faux par rapport à la réponse attendue) ? Réponds oui ou non.
Erreur factuelle :"""

JUDGE_SCORE_BUCKETS = ("0", "20", "40", "60", "80", "100")


def llm_judge_score_choose(llm, item: dict, answer: str,
                           trace: dict | None = None) -> float | None:
    """TPU-native judge: constrained choice over score buckets plus a
    separate erreur_factuelle veto choice — the same 0-100 scale and
    veto semantics as the JSON judge, but the decoder can NEVER emit an
    unparseable verdict: `choose()` ranks the candidate continuations
    by teacher-forced log-likelihood in one prefill, so every call
    yields a valid score (the reference free-decodes JSON and repairs
    it, /root/reference/eval/run_eval.py:426-563,500-544; its repair
    can still fail → judge None → keyword fallback)."""
    fields = dict(question=item["question"],
                  expected=item.get("expected_answer_summary", ""),
                  answer=answer[:6000])
    try:
        bucket, _ = llm.choose(JUDGE_CHOOSE_PROMPT.format(**fields),
                               list(JUDGE_SCORE_BUCKETS))
        veto, _ = llm.choose(JUDGE_VETO_PROMPT.format(**fields),
                             ["non", "oui"])
    except Exception:
        return None
    score = float(bucket) / 100.0
    if trace is not None:
        trace["bucket"] = bucket
        trace["veto"] = veto == "oui"
    if veto == "oui":
        score = min(score, 0.4)  # factual-error veto
    return max(0.0, min(1.0, score))


# ------------------------------------------------------------------ harness

@dataclasses.dataclass
class EvalConfig:
    use_llm_judge: bool = False
    # "json": free decode + repair (reference parity); "choose":
    # constrained score-bucket + veto choices (TPU-native — requires a
    # provider with .choose(); always yields a valid score)
    judge_mode: str = "json"
    weight_judge: float = 0.60
    weight_semantic: float = 0.40
    weight_correctness: float = 0.55
    weight_faithfulness: float = 0.25
    weight_sources: float = 0.20
    n_runs: int = 1
    spread_flag_pct: float = 0.10
    # calibrate the semantic axis against the dataset's null
    # distribution: raw cosine is rescaled by how much it exceeds the
    # answer's MEAN cosine to the other items' expected summaries.
    # A discriminative encoder (real BGE-M3) is barely affected
    # (small positive null, order preserved); a degenerate one
    # (random-init: ~0.99 cosine to EVERYTHING) correctly scores ~0
    # instead of inflating every answer. Without this, training a
    # better encoder LOWERS the recorded quality — the axis must
    # reward discrimination, not saturation.
    semantic_calibrated: bool = True


class EvalHarness:
    def __init__(self, pipeline, embedder=None, judge_llm=None,
                 config: EvalConfig | None = None):
        self.pipeline = pipeline
        self.embedder = embedder
        self.judge_llm = judge_llm
        self.config = config or EvalConfig()

    # ----------------------------------------------------------- one item
    def _semantic(self, item: dict, answer: str) -> float:
        if self.embedder is None:
            return 0.0
        import numpy as np

        vecs = self.embedder.embed_queries(
            [item.get("expected_answer_summary", ""), answer[:4000]]
        )
        return float(np.clip(np.dot(vecs[0], vecs[1]), 0.0, 1.0))

    def _calibrated_semantics(self, dataset, responses) -> list[float]:
        """Batch semantic scores: cosine(expected_i, answer_i) rescaled
        by the null distribution (answer_i vs the OTHER items'
        summaries). See EvalConfig.semantic_calibrated."""
        import numpy as np

        expected = [it.get("expected_answer_summary", "")
                    for it in dataset]
        answers = [r.answer[:4000] for r in responses]
        s_mat = np.asarray(self.embedder.embed_queries(expected))
        a_mat = np.asarray(self.embedder.embed_queries(answers))
        sims = a_mat @ s_mat.T
        n = len(dataset)
        out = []
        for i in range(n):
            raw = float(np.clip(sims[i, i], 0.0, 1.0))
            null = (float((sims[i].sum() - sims[i, i]) / (n - 1))
                    if n > 1 else 0.0)
            cal = (raw - null) / max(1.0 - null, 1e-6)
            out.append(float(np.clip(cal, 0.0, 1.0)))
        return out

    def evaluate_single(self, item: dict, response,
                        semantic: float | None = None) -> dict:
        cfg = self.config
        answer = response.answer
        kscore, missing = keyword_score(item, answer)
        if semantic is None:
            semantic = self._semantic(item, answer)
        judge = None
        if cfg.use_llm_judge and self.judge_llm is not None:
            if (cfg.judge_mode == "choose"
                    and hasattr(self.judge_llm, "choose")):
                judge = llm_judge_score_choose(
                    self.judge_llm, item, answer)
            else:
                judge = llm_judge_score(self.judge_llm, item, answer)
        if judge is not None:
            correctness = (cfg.weight_judge * judge
                           + cfg.weight_semantic * semantic)
        elif self.embedder is not None:
            correctness = 0.5 * kscore + 0.5 * semantic
        else:
            correctness = kscore
        faithfulness = 1.0 if response.grounded else max(
            0.0, 1.0 - 0.25 * len(response.grounding_issues)
        )
        sources = source_quality_score(item, response.sources, answer)
        concise, concise_note = conciseness_score(
            answer, item.get("category"),
            getattr(response, "intent", "factuel") or "factuel",
        )
        global_score = (
            cfg.weight_correctness * correctness
            + cfg.weight_faithfulness * faithfulness
            + cfg.weight_sources * sources
        )
        return {
            "id": item["id"],
            "category": item.get("category"),
            "difficulty": item.get("difficulty"),
            "keyword_score": round(kscore, 4),
            "semantic_score": round(semantic, 4),
            "judge_score": judge,
            "correctness": round(correctness, 4),
            "faithfulness": round(faithfulness, 4),
            "source_score": round(sources, 4),
            "conciseness_score": concise,     # traced, not in global
            "conciseness_note": concise_note,
            "global_score": round(global_score, 4),
            "missing_keywords": missing,
            "n_sources": len(response.sources),
            "time_s": round(response.total_time, 2),
        }

    # ----------------------------------------------------------- full run
    def run(self, dataset: Sequence[dict], query_kwargs=None) -> dict:
        """Two-phase: all pipeline answers first, judging second."""
        cfg = self.config
        t0 = time.time()
        responses = []
        for item in dataset:
            responses.append(self.pipeline.query(
                item["question"], **(query_kwargs or {})
            ))
        semantics: list[float | None] = [None] * len(responses)
        if (self.embedder is not None and cfg.semantic_calibrated
                and len(dataset) > 1):
            semantics = self._calibrated_semantics(dataset, responses)
        results = [
            self.evaluate_single(item, resp, semantic=sem)
            for item, resp, sem in zip(dataset, responses, semantics)
        ]
        scores = [r["global_score"] for r in results]
        by_cat: dict[str, list[float]] = {}
        for r in results:
            by_cat.setdefault(r["category"] or "?", []).append(
                r["global_score"]
            )
        n = len(results)
        report = {
            "n_questions": n,
            "global_score": round(sum(scores) / n, 4) if n else 0.0,
            "global_score_weighted_by_category": round(
                sum(sum(v) / len(v) for v in by_cat.values())
                / max(len(by_cat), 1), 4,
            ),
            "per_category": {
                k: round(sum(v) / len(v), 4) for k, v in by_cat.items()
            },
            "questions_above_85pct": sum(1 for s in scores if s >= 0.85),
            "faithfulness": round(
                sum(r["faithfulness"] for r in results) / n, 4
            ) if n else 0.0,
            "source_score": round(
                sum(r["source_score"] for r in results) / n, 4
            ) if n else 0.0,
            "conciseness": round(
                sum(r["conciseness_score"] for r in results) / n, 4
            ) if n else 0.0,
            "avg_time_per_question": round(
                sum(r["time_s"] for r in results) / n, 2
            ) if n else 0.0,
            "total_time_seconds": round(time.time() - t0, 1),
            "results": results,
        }
        return report

    def run_multi(self, dataset: Sequence[dict], n_runs=None,
                  query_kwargs=None) -> dict:
        cfg = self.config
        n_runs = n_runs or cfg.n_runs
        runs = [self.run(dataset, query_kwargs) for _ in range(n_runs)]
        per_q: dict[str, list[float]] = {}
        for run in runs:
            for r in run["results"]:
                per_q.setdefault(r["id"], []).append(r["global_score"])
        spread_flags = []
        per_question = {}
        for qid, vals in per_q.items():
            mean = statistics.mean(vals)
            std = statistics.pstdev(vals) if len(vals) > 1 else 0.0
            per_question[qid] = {"mean": round(mean, 4),
                                 "std": round(std, 4)}
            if std >= cfg.spread_flag_pct:
                spread_flags.append(qid)
        global_scores = [r["global_score"] for r in runs]
        return {
            "n_runs": n_runs,
            "global_score": {
                "mean": round(statistics.mean(global_scores), 4),
                "std": round(
                    statistics.pstdev(global_scores)
                    if n_runs > 1 else 0.0, 4
                ),
            },
            "per_question": per_question,
            "high_spread_questions": spread_flags,
            "runs": runs,
            "total_time_seconds": round(
                sum(r["total_time_seconds"] for r in runs), 1
            ),
        }

    def save_report(self, report: dict, out_dir, tag: str = "eval"):
        out = pathlib.Path(out_dir)
        out.mkdir(parents=True, exist_ok=True)
        stamp = time.strftime("%Y%m%d_%H%M%S")
        path = out / f"results_{tag}_{stamp}.json"
        path.write_text(json.dumps(report, ensure_ascii=False, indent=1))
        return path
