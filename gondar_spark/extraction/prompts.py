"""Prompt assembly for the extraction stage — the A12/A13 analog
(MessageTemplate.fill /root/reference/gondar/modules/PubMedFlow.py:108-113;
MessagesWrapper.generate :116-129; the 3-message prompt :147-202).

The deterministic extractor doesn't need prompts, but the pipeline is
built to WRAP an LLM extractor (/root/repo/BASELINE.json:6): a real
batched-LLM backend (see operators/extract.py `extractor` param) assembles
one prompt per unit from these templates. Templates are plain job config
— prompt text is data, assembled per Arrow micro-batch, never per row on
the driver.

The message contract mirrors the reference:
  * system: the extraction rules (verbatim spans :168, no empties :170,
    one mention per row :171, fixed schema :172, no newlines :173);
  * user: the reference text + typed heads + motivation;
  * assistant: the self-check acknowledgment (:194-202).
"""

from __future__ import annotations

import dataclasses

# typed "heads" — parenthesized kind tags exactly like the reference's
# head strings (PubMedFlow.py:213-218)
DEFAULT_HEADS = (
    "Defined Function (Named Entity)",
    "Defined Type (Named Entity)",
    "Imported Module (Module Path)",
    "Called Function (Named Entity)",
    "Mentioned Entity (String Literal)",
)

SYSTEM_TEMPLATE = (
    "You are an information extractor over source code. Emit one mention "
    "per row with columns {heads}. Values must be verbatim spans of the "
    "reference text, never empty or 'Not specified', with consistent "
    "column count and no newline characters inside values. Respond as "
    "JSON: {{\"headers\": [...], \"satisfy\": [...], \"data\": {{...}}}}."
)
USER_TEMPLATE = (
    "Reference ({lang}, chunk {chunk_id} of {subj}):\n{reference}\n\n"
    "Motivation: {motivation}"
)
ASSISTANT_TEMPLATE = (
    "I will extract only verbatim spans matching {heads} and flag "
    "unsatisfied headers in `satisfy`."
)


@dataclasses.dataclass(frozen=True)
class MessageTemplate:
    role: str
    template: str

    def fill(self, **kwargs) -> dict[str, str]:
        return {"role": self.role, "content": self.template.format(**kwargs)}


def build_messages(
    reference: str,
    subj: str,
    lang: str,
    chunk_id: int,
    heads: tuple[str, ...] = DEFAULT_HEADS,
    motivation: str = "build the repository knowledge graph",
) -> list[dict[str, str]]:
    """One 3-message prompt per extraction unit (A13)."""
    heads_str = ", ".join(heads)
    return [
        MessageTemplate("system", SYSTEM_TEMPLATE).fill(heads=heads_str),
        MessageTemplate("user", USER_TEMPLATE).fill(
            reference=reference, subj=subj, lang=lang, chunk_id=chunk_id,
            motivation=motivation,
        ),
        MessageTemplate("assistant", ASSISTANT_TEMPLATE).fill(heads=heads_str),
    ]
