"""Chat-conversation flattening with loss-mask spans — the SFT
(supervised fine-tuning) data-prep step: render role-tagged messages
through a template into one training string, and compute the character
spans of ASSISTANT content (the only tokens that take loss in
instruction tuning).

Everything is built-in higher-order functions (`transform`,
`aggregate`, `array_join`) — the whole flatten + span computation stays
inside whole-stage codegen with no Python in the hot path, so it runs
at scan speed over a 100 TB conversation corpus.  The span math is the
classic fold: walk the rendered messages accumulating a cursor, emit
``(start, len)`` when the role matches.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# template: <|role|>content<|end|>
_PRE = "<|"
_MID = "|>"
_END = "<|end|>"


def _rendered(msgs: str) -> str:
    return (
        f"transform({msgs}, m -> concat('{_PRE}', m.role, '{_MID}', "
        f"m.content, '{_END}'))"
    )


def flatten_chat(msgs_col: str) -> Column:
    """The flattened training string for an ``array<struct<role:string,
    content:string>>`` column."""
    return F.expr(f"array_join({_rendered(msgs_col)}, '')")


def loss_spans(msgs_col: str, role: str = "assistant") -> Column:
    """``array<struct<start:bigint, len:bigint>>`` — 0-based character
    spans of ``role`` CONTENT inside :func:`flatten_chat`'s output."""
    return F.expr(f"""
        aggregate(
            {msgs_col},
            struct(
                cast(0 as bigint) as pos,
                cast(array() as array<struct<start:bigint, len:bigint>>)
                    as spans
            ),
            (acc, m) -> struct(
                acc.pos + length('{_PRE}') + length(m.role)
                    + length('{_MID}') + length(m.content)
                    + length('{_END}') as pos,
                case when m.role = '{role}' then array_append(
                    acc.spans,
                    struct(
                        acc.pos + length('{_PRE}') + length(m.role)
                            + length('{_MID}') as start,
                        cast(length(m.content) as bigint) as len
                    ))
                else acc.spans end as spans
            ),
            acc -> acc.spans
        )
    """)


def masked_text(flat_col: str, spans_col: str) -> Column:
    """Concatenation of the span substrings of ``flat_col`` — the text
    that would take loss.  Exactness check: if the spans are off by
    even one character, this no longer equals the assistant contents."""
    return F.expr(
        f"array_join(transform({spans_col}, "
        f"s -> substring({flat_col}, cast(s.start as int) + 1, "
        f"cast(s.len as int))), '')"
    )
