"""Byte-pair-encoding merge training over a WEIGHTED vocabulary — the
Sennrich et al. 2016 (arXiv 1508.07909) subword-tokenizer construction.

The distributed part of BPE training is the word-frequency pass (the
corpus is huge; the unique-word vocabulary obeys Heaps' law and is
small): pipelines/queries.q_bpe_merges runs stages/wordcount.term_counts
over the corpus and only the compact (word, count) vocabulary reaches
this kernel on the driver, exactly like the unigram-LM broadcast.

Determinism contract: ties in pair frequency break by lexicographic
(left, right) ascending, so the merge table is a pure function of the
vocabulary — no RNG, no iteration-order dependence (pair counting uses
sorted dicts of Python strings only).
"""

from __future__ import annotations


def bpe_train(words: list, counts: list, n_merges: int) -> list:
    """Train ``n_merges`` BPE merges over a weighted vocabulary.

    ``words``: unique words (str), ``counts``: corpus frequency of each.
    Returns a list of (rank, left, right, pair_count) tuples, one per
    merge, ranked from 1.  Stops early if no adjacent pair remains.
    """
    vocab = {}
    for w, c in zip(words, counts):
        if not w:
            continue
        sym = tuple(w)
        vocab[sym] = vocab.get(sym, 0) + int(c)

    merges = []
    for rank in range(1, n_merges + 1):
        pairs: dict = {}
        for sym, c in vocab.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + c
        if not pairs:
            break
        # max count; lexicographic (left, right) ascending tie-break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (left, right), cnt = best
        merges.append((rank, left, right, cnt))
        joined = left + right
        new_vocab = {}
        for sym, c in vocab.items():
            out = []
            i = 0
            while i < len(sym):
                if (i + 1 < len(sym) and sym[i] == left
                        and sym[i + 1] == right):
                    out.append(joined)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            t = tuple(out)
            new_vocab[t] = new_vocab.get(t, 0) + c
        vocab = new_vocab
    return merges
