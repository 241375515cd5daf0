"""Shared XML text/attribute escaping for the fixture writers — ONE
implementation instead of a per-module copy, so an escaping fix can
never diverge between container writers."""

from __future__ import annotations

from xml.sax.saxutils import escape, quoteattr

__all__ = ["xml_escape", "xml_attr"]


def xml_escape(s: str) -> str:
    """Escape text content (also safe inside double-quoted attrs)."""
    return escape(s, {'"': "&quot;"})


def xml_attr(s: str) -> str:
    """A fully quoted attribute VALUE including its quotes."""
    return quoteattr(s)
