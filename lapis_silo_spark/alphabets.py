"""Symbol alphabets and the IUPAC ambiguity lattice.

Public-knowledge IUPAC nucleotide codes and standard amino-acid ambiguity
codes; the reference encodes the same lattice in
``/root/reference/src/silo/common/nucleotide_symbols.h`` /
``aa_symbols.h`` and documents the maybe()/exact() semantics in
``documentation/maybe_documentation.md:19-141``.

``CODES_FOR[symbol]`` = the set of *concrete* symbols the stored symbol could
represent. The derived matched-by relation (``AMBIGUITY_SYMBOLS`` in the
reference docs) is: stored ``Y`` matches searched ``S`` iff
``CODES_FOR[S] ⊆ CODES_FOR[Y]`` — i.e. Y is at least as general as S.

The searched-symbol expansion mirrors ``symbol_equals.cpp:65-93`` exactly:

- mode NONE        : stored == searched symbol (literal).
- mode UPPER_BOUND : ``maybe()`` — stored ∈ AMBIGUITY_SYMBOLS[searched]
  (every stored symbol that *could* be the searched one, including the
  missing symbol N/X which could be anything).
- mode LOWER_BOUND : ``exact()`` — the reference rewrites this to the same
  literal single-symbol set as NONE (``symbol_equals.cpp:90-93``); the
  distinction only affects how enclosing expressions (e.g. hasMutation,
  mutation profiles) expand, not the leaf equality itself.
"""

from __future__ import annotations

NUC_MISSING = "N"
AA_MISSING = "X"

# IUPAC nucleotide codes (public standard; the reference's alphabet has no
# RNA 'U'). Gap '-' is a concrete symbol. 'N' means *unknown* — it could be
# any base or a gap (``maybe_documentation.md``: N -> {all symbols}).
NUC_CODES_FOR: dict[str, frozenset[str]] = {
    "A": frozenset("A"),
    "C": frozenset("C"),
    "G": frozenset("G"),
    "T": frozenset("T"),
    "R": frozenset("AG"),
    "Y": frozenset("CT"),
    "S": frozenset("GC"),
    "W": frozenset("AT"),
    "K": frozenset("GT"),
    "M": frozenset("AC"),
    "B": frozenset("CGT"),
    "D": frozenset("AGT"),
    "H": frozenset("ACT"),
    "V": frozenset("ACG"),
    "N": frozenset("ACGT-"),
    "-": frozenset("-"),
}

# 22 concrete amino acids (incl. O pyrrolysine, U selenocysteine — present in
# the reference alphabet), '*' stop, '-' gap; B/J/Z two-way ambiguity; 'X'
# means unknown — any amino acid, stop, or gap.
_AA_BASE = "ACDEFGHIKLMNOPQRSTUVWY"
AA_CODES_FOR: dict[str, frozenset[str]] = {
    **{aa: frozenset(aa) for aa in _AA_BASE},
    "B": frozenset("ND"),
    "J": frozenset("IL"),
    "Z": frozenset("EQ"),
    "X": frozenset(_AA_BASE + "*-"),
    "*": frozenset("*"),
    "-": frozenset("-"),
}

NUC_SYMBOLS = sorted(NUC_CODES_FOR)
AA_SYMBOLS = sorted(AA_CODES_FOR)


def codes_for(symbol: str, is_amino_acid: bool) -> frozenset[str]:
    table = AA_CODES_FOR if is_amino_acid else NUC_CODES_FOR
    try:
        return table[symbol]
    except KeyError:
        raise ValueError(f"unknown {'amino acid' if is_amino_acid else 'nucleotide'} "
                         f"symbol: {symbol!r}") from None


def ambiguity_symbols(symbol: str, is_amino_acid: bool) -> set[str]:
    """Stored symbols at least as general as ``symbol``
    (``AMBIGUITY_SYMBOLS`` in ``maybe_documentation.md:53-76``)."""
    table = AA_CODES_FOR if is_amino_acid else NUC_CODES_FOR
    searched = codes_for(symbol, is_amino_acid)
    return {s for s, cset in table.items() if searched <= cset}


def expand_symbol(symbol: str, mode: str, is_amino_acid: bool) -> set[str]:
    """All *stored* symbols that match a searched ``symbol`` under ``mode``.

    ``mode`` in {"none", "upper_bound", "lower_bound"} (AmbiguityMode values).
    """
    if mode in ("none", "lower_bound"):
        codes_for(symbol, is_amino_acid)  # validate
        return {symbol}
    if mode == "upper_bound":  # maybe()
        return ambiguity_symbols(symbol, is_amino_acid)
    raise ValueError(f"unknown ambiguity mode: {mode}")
