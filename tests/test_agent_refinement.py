"""Expert-refinement node: polish accepted / rejected on safety rules."""

from rag_dpo_tpu.agent.nodes import NodeComponents, expert_refinement
from rag_dpo_tpu.agent.state import AgentState
from rag_dpo_tpu.providers import FakeLLMProvider
from rag_dpo_tpu.providers.base import LLMResponse
from rag_dpo_tpu.rag.context import ContextBuilder
from rag_dpo_tpu.rag.generator import Generator
from rag_dpo_tpu.rag.intent import IntentClassifier
from rag_dpo_tpu.rag.validators import GroundingValidator


def _components(llm):
    return NodeComponents(
        llm=llm, retriever=None, generator=Generator(llm),
        context_builder=ContextBuilder(),
        intent_classifier=IntentClassifier(llm),
        grounding_validator=GroundingValidator(),
    )


def _state(answer):
    s = AgentState(question="q")
    s.answer = answer
    return s


def test_refinement_accepts_good_polish():
    class Refiner(FakeLLMProvider):
        def generate(self, prompt, **kw):
            return LLMResponse(
                "## Réponse\n- Point un [Source 1]\n- Point deux [Source 2]"
            )

    s = _state("Point un [Source 1]. Point deux [Source 2].")
    s = expert_refinement(_components(Refiner()), s)
    assert s.answer.startswith("## Réponse")


def test_refinement_rejects_citation_loss():
    class Loser(FakeLLMProvider):
        def generate(self, prompt, **kw):
            return LLMResponse("Réponse embellie sans aucune citation.")

    original = "Fait établi [Source 1]."
    s = _state(original)
    s = expert_refinement(_components(Loser()), s)
    assert s.answer == original  # rejected


def test_refinement_rejects_bloat():
    class Bloater(FakeLLMProvider):
        def generate(self, prompt, **kw):
            return LLMResponse(("Blabla [Source 1]. " * 100))

    original = "Court [Source 1]."
    s = _state(original)
    s = expert_refinement(_components(Bloater()), s)
    assert s.answer == original  # >1.8× / +500 chars → rejected


def test_refinement_survives_provider_error():
    class Broken(FakeLLMProvider):
        def generate(self, prompt, **kw):
            return LLMResponse("", error="down")

    original = "Réponse initiale [Source 1]."
    s = _state(original)
    s = expert_refinement(_components(Broken()), s)
    assert s.answer == original
