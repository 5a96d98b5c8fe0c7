"""Symbol alphabets and the IUPAC ambiguity lattice.

Public-knowledge IUPAC nucleotide codes and standard amino-acid ambiguity
codes; the reference encodes the same lattice in
``/root/reference/src/silo/common/nucleotide_symbols.h`` /
``aa_symbols.h`` and documents the maybe()/exact() semantics in
``documentation/maybe_documentation.md:19-141``.

``CODES_FOR[symbol]`` = the set of *certain* base symbols the stored symbol
could represent. The ambiguity rewrite (``symbol_equals.cpp:65-93``) uses it:

- mode NONE        : stored == searched symbol.
- mode UPPER_BOUND : stored may represent the searched set → any stored
  symbol whose code set intersects the searched set matches (``maybe()``).
- mode LOWER_BOUND : stored certainly within the searched set → stored
  symbols whose code set is a subset match (``exact()``).
"""

from __future__ import annotations

NUC_MISSING = "N"
AA_MISSING = "X"

# IUPAC nucleotide codes (public standard). Gap '-' is a concrete symbol.
NUC_CODES_FOR: dict[str, frozenset[str]] = {
    "A": frozenset("A"),
    "C": frozenset("C"),
    "G": frozenset("G"),
    "T": frozenset("T"),
    "U": frozenset("T"),
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
    "N": frozenset("ACGT"),
    "-": frozenset("-"),
}

_AA_BASE = "ACDEFGHIKLMNPQRSTVWY"
AA_CODES_FOR: dict[str, frozenset[str]] = {
    **{aa: frozenset(aa) for aa in _AA_BASE},
    "B": frozenset("ND"),
    "J": frozenset("IL"),
    "Z": frozenset("EQ"),
    "X": frozenset(_AA_BASE),
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


def expand_symbol(symbol: str, mode: str, is_amino_acid: bool) -> set[str]:
    """All *stored* symbols that match a searched ``symbol`` under ``mode``.

    ``mode`` in {"none", "upper_bound", "lower_bound"} (AmbiguityMode values).
    """
    table = AA_CODES_FOR if is_amino_acid else NUC_CODES_FOR
    searched = codes_for(symbol, is_amino_acid)
    if mode == "none":
        return {symbol}
    if mode == "upper_bound":  # maybe()
        return {s for s, cset in table.items() if cset & searched}
    if mode == "lower_bound":  # exact()
        return {s for s, cset in table.items() if cset <= searched}
    raise ValueError(f"unknown ambiguity mode: {mode}")
