"""Context building: intent-adapted prompts, reverse packing, map-reduce,
citation renumbering.

Role parity with `src/rag/context_builder.py` (890 LoC): a base system
prompt plus per-intent variants (:25-227), reverse document packing so the
most relevant source sits closest to the question — exploiting LLM recency
bias (:615-694, default reverse=True), map-reduce summarization when the
context exceeds the character budget (:420-540), last-5-turn history
formatting (:696-707), and `format_response_with_sources` which renumbers
cited sources to a dense 1..N (:758-868). All prompts independently
authored.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Sequence

from ..providers.base import BaseLLMProvider
from .validators import extract_citations

BASE_SYSTEM_PROMPT = """Tu es un assistant documentaire spécialisé dans la
protection des données personnelles (RGPD, doctrine CNIL), au service d'un
délégué à la protection des données.

Règles impératives :
1. Réponds UNIQUEMENT à partir des sources fournies dans le contexte.
2. Cite chaque affirmation importante avec [Source N] correspondant à la
   numérotation du contexte.
3. N'invente jamais de chiffre, de délai, d'article ou de référence : si
   l'information n'est pas dans les sources, dis-le explicitement.
4. Réponds en français professionnel, structuré en Markdown.
5. Ne recopie pas les sources in extenso : synthétise.
"""

INTENT_INSTRUCTIONS: dict[str, str] = {
    "factuel": (
        "Donne la réponse factuelle précise en premier (délai, seuil, "
        "définition), puis le détail utile. Reste concis."
        "{negative_instruction}"
    ),
    "methodologique": (
        "Structure ta réponse en étapes numérotées et actionnables, dans "
        "l'ordre opérationnel. Mentionne les livrables attendus."
        "{negative_instruction}"
    ),
    "organisationnel": (
        "Précise les rôles et responsabilités de chaque acteur "
        "(responsable de traitement, DPO, sous-traitant, direction)."
        "{negative_instruction}"
    ),
    "comparaison": (
        "Présente d'abord chaque notion, puis un tableau ou une liste des "
        "différences et points communs, puis une conclusion pratique."
        "{negative_instruction}"
    ),
    "cas_pratique": (
        "Qualifie juridiquement la situation décrite, puis déroule les "
        "obligations applicables et les actions recommandées."
        "{negative_instruction}"
    ),
    "liste_exhaustive": (
        "Fournis une énumération complète sous forme de liste à puces ; "
        "signale explicitement si les sources ne permettent pas "
        "l'exhaustivité.{negative_instruction}"
    ),
    "refus": (
        "La question sort du périmètre protection des données : décline "
        "poliment et recentre sur le RGPD.{negative_instruction}"
    ),
}

USER_PROMPT_TEMPLATE = """{history}Contexte documentaire :
{context}

Instructions spécifiques : {instructions}

Question : {question}

Réponse (avec citations [Source N]) :"""

MAP_PROMPT = """À partir de l'extrait documentaire suivant, note tout
élément utile pour répondre à la question. Conserve les références
[Source N] d'origine. Si rien n'est pertinent, réponds "RIEN".

Question : {question}

Extrait :
{chunk}

Éléments pertinents :"""

REDUCE_PROMPT = """Fusionne les notes partielles suivantes en une réponse
unique, structurée, citant les [Source N] d'origine.

Question : {question}

Notes :
{partials}

Réponse fusionnée :"""


@dataclasses.dataclass
class BuiltContext:
    system_prompt: str
    user_prompt: str
    context_text: str
    sources: list[dict]       # [{'n', 'title', 'url', 'chunk_ids'}]
    map_reduced: bool = False


class ContextBuilder:
    def __init__(
        self,
        llm: BaseLLMProvider | None = None,
        max_context_chars: int = 32_000,
        reverse_packing: bool = True,
        history_turns: int = 5,
        map_batch_chars: int = 5_000,
    ):
        self.llm = llm
        self.max_context_chars = max_context_chars
        self.reverse_packing = reverse_packing
        self.history_turns = history_turns
        self.map_batch_chars = map_batch_chars

    # ----------------------------------------------------------- building
    def build_context(
        self,
        question: str,
        documents: Sequence,         # RetrievedDocument list
        intent: str = "factuel",
        negative_topics: Sequence[str] = (),
        conversation_history: Sequence[dict] | None = None,
    ) -> BuiltContext:
        neg = ""
        if negative_topics:
            neg = (
                " N'aborde pas les thèmes suivants, explicitement exclus "
                f"par la question : {', '.join(negative_topics)}."
            )
        instructions = INTENT_INSTRUCTIONS.get(
            intent, INTENT_INSTRUCTIONS["factuel"]
        ).format(negative_instruction=neg)

        blocks, sources = self._format_documents(documents)
        context_text = "\n\n".join(blocks)

        map_reduced = False
        if len(context_text) > self.max_context_chars and self.llm is not None:
            context_text = self._map_reduce(question, blocks)
            map_reduced = True
        elif len(context_text) > self.max_context_chars:
            context_text = context_text[: self.max_context_chars]

        history = self._format_history(conversation_history)
        user_prompt = USER_PROMPT_TEMPLATE.format(
            history=history,
            context=context_text,
            instructions=instructions,
            question=question,
        )
        return BuiltContext(
            system_prompt=BASE_SYSTEM_PROMPT,
            user_prompt=user_prompt,
            context_text=context_text,
            sources=sources,
            map_reduced=map_reduced,
        )

    def _format_documents(self, documents: Sequence):
        """Number sources 1..N by relevance; pack least-relevant FIRST
        (reverse packing → best source nearest the question)."""
        sources = []
        numbered_blocks = []
        for n, doc in enumerate(documents, start=1):
            parts = []
            for chunk in doc.chunks:
                heading = chunk.heading
                text = chunk.text
                parts.append(f"### {heading}\n{text}" if heading else text)
            body = "\n\n".join(parts)
            title = doc.title or doc.doc_key
            numbered_blocks.append(
                f"[Source {n}] {title}\n{body}"
            )
            sources.append({
                "n": n,
                "title": title,
                "url": getattr(doc.chunks[0], "source_url", ""),
                "chunk_ids": [c.chunk_id for c in doc.chunks],
            })
        blocks = (
            list(reversed(numbered_blocks))
            if self.reverse_packing
            else numbered_blocks
        )
        return blocks, sources

    def _format_history(self, history) -> str:
        if not history:
            return ""
        turns = list(history)[-self.history_turns :]
        lines = []
        for turn in turns:
            role = "Utilisateur" if turn.get("role") == "user" else "Assistant"
            lines.append(f"{role} : {turn.get('content', '')}")
        return "Historique de la conversation :\n" + "\n".join(lines) + "\n\n"

    # --------------------------------------------------------- map-reduce
    def _map_reduce(self, question: str, blocks: list[str]) -> str:
        batches: list[str] = []
        cur = ""
        for block in blocks:
            if cur and len(cur) + len(block) > self.map_batch_chars:
                batches.append(cur)
                cur = block
            else:
                cur = f"{cur}\n\n{block}" if cur else block
        if cur:
            batches.append(cur)

        partials = []
        for batch in batches:
            resp = self.llm.generate(
                MAP_PROMPT.format(question=question, chunk=batch),
                temperature=0.0,
            )
            if resp.ok and resp.text.strip() and \
                    resp.text.strip().upper() != "RIEN":
                partials.append(resp.text.strip())
        if not partials:
            return "\n\n".join(blocks)[: self.max_context_chars]
        resp = self.llm.generate(
            REDUCE_PROMPT.format(question=question,
                                 partials="\n\n---\n\n".join(partials)),
            temperature=0.0,
        )
        if resp.ok and resp.text.strip():
            return resp.text.strip()
        return "\n\n".join(partials)[: self.max_context_chars]

    # ------------------------------------------------- response formatting
    def format_response_with_sources(
        self, answer: str, sources: list[dict]
    ) -> tuple[str, list[dict]]:
        """Renumber cited sources to dense 1..K (cited-only), append a
        'Sources' section. Citation renumbering via placeholder pass so
        overlapping rewrites can't collide (reference :783-799)."""
        cited = []
        for c in extract_citations(answer):
            if c not in cited and 1 <= c <= len(sources):
                cited.append(c)
        if not cited:
            return answer, []

        mapping = {old: new for new, old in enumerate(cited, start=1)}

        def to_placeholder(m: re.Match) -> str:
            nums = [int(x) for x in re.findall(r"\d+", m.group(1))]
            kept = [mapping[n] for n in nums if n in mapping]
            if not kept:
                return ""
            return "\x00SRC" + ",".join(map(str, kept)) + "\x00"

        tmp = re.sub(
            r"\[(?:Sources?)\s+(\d+(?:\s*(?:,|et)\s*\d+)*)\]",
            to_placeholder, answer, flags=re.IGNORECASE,
        )

        def from_placeholder(m: re.Match) -> str:
            nums = m.group(1).split(",")
            label = "Source" if len(nums) == 1 else "Sources"
            return f"[{label} {', '.join(nums)}]"

        renumbered = re.sub("\x00SRC([0-9,]+)\x00", from_placeholder, tmp)

        used = []
        for old in cited:
            src = dict(sources[old - 1])
            src["n"] = mapping[old]
            used.append(src)

        lines = ["", "---", "**Sources :**"]
        for src in used:
            url = f" — {src['url']}" if src.get("url") else ""
            lines.append(f"{src['n']}. {src['title']}{url}")
        return renumbered + "\n" + "\n".join(lines), used


def fix_markdown_formatting(text: str) -> str:
    """Markdown cleanup pass (reference `_fix_markdown_formatting`
    :595-661): normalize bullet markers, collapse >2 blank lines, ensure
    space after heading hashes, balance unclosed bold markers."""
    text = re.sub(r"^[•●▪]\s*", "- ", text, flags=re.MULTILINE)
    text = re.sub(r"^(#{1,6})([^#\s])", r"\1 \2", text, flags=re.MULTILINE)
    text = re.sub(r"\n{3,}", "\n\n", text)
    if text.count("**") % 2 == 1:
        text += "**"
    return text.strip()
