"""Vocab-file readers/writers (reference op R4).

The reference keeps its label space in sidecar text files: tag vocab
(`dataset.py:73-81` parse_tag_vocab), aux pos/dep vocabs prefixed with the
none tag (`dataset.py:83-93` parse_aux_tag_vocab), and a tag -> question
text map (`dataset_qa.py:54-63` parse_tag_names, tab-separated). These are
driver-side reads; the resulting dicts ship to workers once via actor
constructor kwargs / ray.put (J2/J3 broadcast lookups).
"""

from __future__ import annotations


def read_tag_vocab(path: str) -> list[str]:
    """One tag per non-blank line (parse_tag_vocab, dataset.py:73-81)."""
    out = []
    with open(path, "r", encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if line:
                out.append(line)
    return out


def read_aux_tag_vocab(path: str, none_tag: str, do_task: bool = True) -> list[str]:
    """none_tag-prefixed aux vocab (parse_aux_tag_vocab, dataset.py:83-93);
    returns [] when the consuming task is disabled, as the reference does."""
    if not do_task:
        return []
    return [none_tag] + read_tag_vocab(path)


def read_tag_names(path: str) -> dict[str, str]:
    """tag<TAB>display-name map (parse_tag_names, dataset_qa.py:54-63)."""
    out: dict[str, str] = {}
    with open(path, "r", encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if line:
                s = line.split("\t")
                out[s[0]] = s[1]
    return out


def write_vocab(items, path: str) -> None:
    """Sorted one-per-line vocab emission (utils/general.py:143,157-158)."""
    with open(path, "w", encoding="utf-8") as f:
        for item in sorted(items):
            f.write(f"{item}\n")


def write_tag_names(mapping: dict[str, str], path: str) -> None:
    with open(path, "w", encoding="utf-8") as f:
        for tag in sorted(mapping):
            f.write(f"{tag}\t{mapping[tag]}\n")
