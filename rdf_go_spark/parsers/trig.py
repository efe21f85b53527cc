"""TriG parser: Turtle + graph blocks.

Grammar (TriG 1.2): directives | wrappedGraph | GRAPH label wrappedGraph |
label wrappedGraph | triples '.'. Constraints enforced to match the W3C
trig suite and the reference decoder (rdf/trig_decoder.go:46-250):
- no nested graph blocks (rdf/trig_decoder.go:614-633)
- no directives inside graph blocks
- graph label is IRI or blank node (incl. ANON)
- statements inside a block are stamped with G (rdf/trig_decoder.go:518-521)

Implementation: subclass of TurtleParser with a current-graph register;
all emission flows through ``_emit`` so every Turtle feature (collections,
annotations, reifiers, …) lands in the right graph for free.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Tuple

from ..terms import BlankNode, IRI, ParseError, Quad, Term
from .turtle import TurtleParser, _WS


class TrigParser(TurtleParser):
    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.current_graph: Optional[Term] = None
        self.in_graph_block = False

    def _emit(self, s, p, o) -> None:
        self.triples.append(Quad(s, p, o, self.current_graph))

    def parse_statement(self) -> None:
        self.skip_ws()
        if self.peek() == "@":
            if self.in_graph_block:
                raise self.error("directive not allowed inside graph block")
            self.parse_at_directive()
            return
        word = self._peek_word()
        if word.upper() in ("PREFIX", "BASE", "VERSION") and \
                self._is_sparql_directive(word):
            if self.in_graph_block:
                raise self.error("directive not allowed inside graph block")
            self.parse_sparql_directive(word)
            return
        if self.peek() == "{":
            # anonymous wrapped graph → default graph
            self.parse_wrapped_graph(None)
            return
        if word.upper() == "GRAPH" and self._graph_keyword_applies(word):
            self.pos += len(word)
            self.skip_ws()
            label = self.parse_graph_label()
            self.skip_ws()
            if self.peek() != "{":
                raise self.error("expected '{' after GRAPH label")
            self.parse_wrapped_graph(label)
            return
        # triplesOrGraph: labelOrSubject ( wrappedGraph | po-list '.' )
        save = self.pos
        if self.peek() == "[":
            # could be ANON graph label or bnode property list subject
            subject = self._try_anon_then_brace()
            if subject is not None:
                self.parse_wrapped_graph(subject)
                return
            self.pos = save
            self.parse_triples()
            self.skip_ws()
            self.expect(".")
            return
        if self.startswith("<<") or self.peek() == "(":
            self.parse_triples()
            self.skip_ws()
            self.expect(".")
            return
        # IRI / prefixed name / bnode label: parse term, then decide
        subject = self.parse_subject(0)
        self.skip_ws()
        if self.peek() == "{":
            if not isinstance(subject, (IRI, BlankNode)):
                raise self.error("graph label must be IRI or blank node")
            self.parse_wrapped_graph(subject)
            return
        self.parse_predicate_object_list(subject, 0)
        self.skip_ws()
        self.expect(".")

    def _graph_keyword_applies(self, word: str) -> bool:
        """'GRAPH' only acts as keyword when followed by a label + '{'."""
        i = self.pos + len(word)
        while i < self.n and self.s[i] in _WS:
            i += 1
        return i < self.n and (self.s[i] in "<[_" or self._looks_like_pname(i))

    def _looks_like_pname(self, i: int) -> bool:
        j = i
        while j < self.n and (self.s[j].isalnum() or self.s[j] in "_-." or
                              ord(self.s[j]) >= 0x80):
            j += 1
        return j < self.n and self.s[j] == ":"

    def _try_anon_then_brace(self) -> Optional[Term]:
        """Detect ``[] {`` (ANON graph label) without consuming a property
        list subject."""
        save = self.pos
        self.pos += 1  # '['
        self.skip_ws()
        if self.peek() == "]":
            self.pos += 1
            self.skip_ws()
            if self.peek() == "{":
                return self.new_bnode()
        self.pos = save
        return None

    def parse_graph_label(self) -> Term:
        self.skip_ws()
        if self.startswith("_:"):
            return self.parse_bnode_label()
        if self.peek() == "[":
            self.pos += 1
            self.skip_ws()
            self.expect("]")
            return self.new_bnode()
        if self.peek() == "<":
            return self.parse_iriref()
        term = self.parse_prefixed_or_keyword(allow_literal=False)
        if not isinstance(term, IRI):
            raise self.error("graph label must be IRI or blank node")
        return term

    def parse_wrapped_graph(self, label: Optional[Term]) -> None:
        if self.in_graph_block:
            raise self.error("nested graph blocks not allowed")
        self.expect("{")
        self.in_graph_block = True
        self.current_graph = label
        try:
            while True:
                self.skip_ws()
                if self.peek() == "}":
                    self.pos += 1
                    return
                if self.pos >= self.n:
                    raise self.error("unterminated graph block")
                if self.peek() == "{":
                    raise self.error("nested graph blocks not allowed")
                if self.peek() == "@":
                    raise self.error("directive not allowed inside graph block")
                word = self._peek_word()
                if word.upper() in ("PREFIX", "BASE", "VERSION", "GRAPH") and \
                        (word.upper() == "GRAPH" or self._is_sparql_directive(word)):
                    raise self.error(
                        f"{word} not allowed inside graph block")
                self.parse_triples()
                self.skip_ws()
                if self.peek() == ".":
                    self.pos += 1
                    continue
                if self.peek() == "}":
                    self.pos += 1
                    return
                raise self.error("expected '.' or '}' in graph block")
        finally:
            self.in_graph_block = False
            self.current_graph = None


def parse_trig(text: str, base: str = "",
               bnode_factory: Optional[Callable[[], BlankNode]] = None,
               star_semantics: str = "rdf12"
               ) -> Tuple[List[Quad], List[ParseError]]:
    parser = TrigParser(text, base=base, bnode_factory=bnode_factory,
                        star_semantics=star_semantics)
    try:
        return parser.parse(), []
    except ParseError as e:
        return parser.triples, [e]
    except RecursionError:
        return parser.triples, [ParseError("max depth exceeded", code="ERR_DEPTH")]
