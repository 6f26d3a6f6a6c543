"""Pure-Python single-process reference engine (the rank-identity oracle).

Shares the pinned tokenizer (functions/analysis.py) and BM25 formula
(functions/bm25.py) with the Spark engine — SURVEY.md §5.2.4 — but is
otherwise an independent implementation: plain dict/numpy postings,
exhaustive scoring, no Spark, no codec.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd

from dynamo2es_lambda_spark.functions import analysis, bm25


class PyOracle:
    def __init__(self, doc_ids: list[str], texts: list[str]) -> None:
        order = np.argsort(np.array(doc_ids, dtype=object), kind="stable")
        self.doc_ids = [doc_ids[i] for i in order]
        toks = analysis.tokenize_series(pd.Series([texts[i] for i in order]))
        self.toks = [list(t) for t in toks]
        self.n_docs = len(self.doc_ids)
        self.dl = np.array([len(t) for t in toks], dtype=np.int64)
        self.avgdl = float(self.dl.mean()) if self.n_docs else 0.0
        self.postings: dict[str, list[tuple[int, int]]] = {}
        for d, ts in enumerate(toks):
            for t, c in Counter(ts).items():
                self.postings.setdefault(t, []).append((d, c))
        self.df = {t: len(p) for t, p in self.postings.items()}

    def topk(self, query: str, k: int = 10, mode: str = "or",
             minimum_should_match=None):
        """→ list[(doc_id, score)] ordered by (score desc, doc_id asc)."""
        qtoks = analysis.tokenize_series(pd.Series([query]))[0]
        qterms = sorted(Counter(qtoks).items())  # ascending term order
        scores: dict[int, float] = {}
        matched: dict[int, int] = {}
        n_live = 0
        for t, qtf in qterms:
            plist = self.postings.get(t)
            if not plist:
                continue
            n_live += 1
            w = float(bm25.idf(self.n_docs, self.df[t])) * (bm25.K1 + 1.0) * qtf
            for d, tf in plist:
                s = w * float(bm25.tf_norm(tf, self.dl[d], self.avgdl))
                scores[d] = scores.get(d, 0.0) + s
                matched[d] = matched.get(d, 0) + 1
        if mode == "and":
            need = sum(1 for t, _ in qterms)
            scores = {d: s for d, s in scores.items() if matched[d] == need}
        elif minimum_should_match is not None:
            scores = {
                d: s for d, s in scores.items()
                if matched[d] >= minimum_should_match
            }
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], self.doc_ids[kv[0]]))
        return [(self.doc_ids[d], s) for d, s in ranked[:k]]

    def _score_and(self, d: int, qterms) -> float:
        """Summed BM25 of the distinct query terms for doc d (AND score)."""
        s = 0.0
        for t, qtf in qterms:
            tf = dict(self.postings[t]).get(d)
            w = float(bm25.idf(self.n_docs, self.df[t])) * (bm25.K1 + 1.0) * qtf
            s += w * float(bm25.tf_norm(tf, self.dl[d], self.avgdl))
        return s

    def phrase_topk(self, query: str, k: int = 10, slop: int = 0):
        """match_phrase: docs containing the consecutive token sequence
        (slop=0) or an in-order span whose width fits len-1+slop,
        scored as the AND score of the phrase's distinct terms."""
        import bisect

        ptoks = list(analysis.tokenize_series(pd.Series([query]))[0])
        if not ptoks or any(t not in self.postings for t in set(ptoks)):
            return []
        qterms = sorted(Counter(ptoks).items())
        n = len(ptoks)
        hits = []
        for d, dt in enumerate(self.toks):
            if slop == 0:
                matched = any(
                    dt[i: i + n] == ptoks for i in range(len(dt) - n + 1)
                )
            else:
                pos = {
                    t: [i for i, x in enumerate(dt) if x == t]
                    for t in set(ptoks)
                }
                matched = False
                for p0 in pos[ptoks[0]]:
                    cur, ok = p0, True
                    for t in ptoks[1:]:
                        lst = pos[t]
                        j = bisect.bisect_right(lst, cur)
                        if j >= len(lst):
                            ok = False
                            break
                        cur = lst[j]
                    if ok and cur - p0 <= n - 1 + slop:
                        matched = True
                        break
            if matched:
                hits.append((d, self._score_and(d, qterms)))
        ranked = sorted(hits, key=lambda kv: (-kv[1], self.doc_ids[kv[0]]))
        return [(self.doc_ids[d], s) for d, s in ranked[:k]]

    @staticmethod
    def _levenshtein(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    def fuzzy_topk(self, probe: str, k: int = 10, max_edits: int = 1,
                   max_expansions=50):
        """ES fuzzy: expand to dictionary terms within edit distance,
        deterministic cap by (distance, term), OR-score qtf=1."""
        cands = sorted(
            (self._levenshtein(t, probe), t)
            for t in self.postings
            if abs(len(t) - len(probe)) <= max_edits
        )
        terms = [t for d, t in cands if d <= max_edits]
        if max_expansions is not None:
            terms = terms[:max_expansions]
        scores: dict[int, float] = {}
        for t in terms:
            w = float(bm25.idf(self.n_docs, self.df[t])) * (bm25.K1 + 1.0)
            for d, tf in self.postings[t]:
                s = w * float(bm25.tf_norm(tf, self.dl[d], self.avgdl))
                scores[d] = scores.get(d, 0.0) + s
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], self.doc_ids[kv[0]]))
        return [(self.doc_ids[d], s) for d, s in ranked[:k]]

    def bool_topk(self, must: str, should: str, must_not: str, k: int = 10,
                  filt: str = ""):
        """ES bool: must = AND (scored), should = optional score, must_not =
        filter-out, filt = AND required but UNSCORED (filter context).
        Candidates = must-matchers, or should-matchers when no must clause,
        or filter-matchers (score 0) when neither exists."""
        def qterms(q):
            return sorted(
                Counter(analysis.tokenize_series(pd.Series([q]))[0]).items()
            ) if q else []

        mt, st, nt = qterms(must), qterms(should), qterms(must_not)
        ft = qterms(filt)

        def or_scores(terms):
            out: dict[int, tuple[float, int]] = {}
            for t, qtf in terms:
                if t not in self.postings:
                    continue
                w = (float(bm25.idf(self.n_docs, self.df[t]))
                     * (bm25.K1 + 1.0) * qtf)
                for d, tf in self.postings[t]:
                    s = w * float(bm25.tf_norm(tf, self.dl[d], self.avgdl))
                    ps, pn = out.get(d, (0.0, 0))
                    out[d] = (ps + s, pn + 1)
            return out

        if mt:
            m = or_scores(mt)
            cand = {d: s for d, (s, n) in m.items() if n == len(mt)}
            if st:
                s_sc = or_scores(st)
                cand = {d: s + s_sc.get(d, (0.0, 0))[0]
                        for d, s in cand.items()}
        elif st:
            cand = {d: s for d, (s, _n) in or_scores(st).items()}
        elif ft:
            f = or_scores(ft)
            cand = {d: 0.0 for d, (_s, n) in f.items() if n == len(ft)}
        else:
            return []
        if ft and (mt or st):
            f = or_scores(ft)
            keep = {d for d, (_s, n) in f.items() if n == len(ft)}
            cand = {d: s for d, s in cand.items() if d in keep}
        if nt:
            excl = set(or_scores(nt))
            cand = {d: s for d, s in cand.items() if d not in excl}
        ranked = sorted(cand.items(), key=lambda kv: (-kv[1], self.doc_ids[kv[0]]))
        return [(self.doc_ids[d], s) for d, s in ranked[:k]]

    def regexp_topk(self, pattern: str, k: int = 10, max_expansions=50):
        """ES regexp query: whole-term anchored match against the dictionary,
        deterministic term-ascending cap, OR-score qtf=1."""
        import re

        rx = re.compile(f"^(?:{pattern.lower()})$")
        terms = sorted(t for t in self.postings if rx.match(t))
        if max_expansions is not None:
            terms = terms[:max_expansions]
        scores: dict[int, float] = {}
        for t in terms:
            w = float(bm25.idf(self.n_docs, self.df[t])) * (bm25.K1 + 1.0)
            for d, tf in self.postings[t]:
                s = w * float(bm25.tf_norm(tf, self.dl[d], self.avgdl))
                scores[d] = scores.get(d, 0.0) + s
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], self.doc_ids[kv[0]]))
        return [(self.doc_ids[d], s) for d, s in ranked[:k]]

    def phrase_prefix_topk(self, query: str, k: int = 10, max_expansions=50):
        """match_phrase_prefix: last token is a prefix; a doc matches when
        the fixed tokens occur consecutively followed by any expansion of
        the prefix; score = AND score of fixed terms + max over matching
        expansions of the expansion's qtf=1 BM25."""
        ptoks = list(analysis.tokenize_series(pd.Series([query]))[0])
        if not ptoks:
            return []
        fixed, pfx = ptoks[:-1], ptoks[-1]
        if any(t not in self.postings for t in set(fixed)):
            return []
        exps = sorted(t for t in self.postings if t.startswith(pfx))
        if max_expansions is not None:
            exps = exps[:max_expansions]
        if not exps:
            return []
        qterms_fixed = sorted(Counter(fixed).items())
        n = len(fixed)
        hits = []
        for d, dt in enumerate(self.toks):
            best = None
            for e in exps:
                seq = fixed + [e]
                if any(
                    dt[i: i + n + 1] == seq for i in range(len(dt) - n)
                ):
                    tf = dict(self.postings[e])[d]
                    se = (
                        float(bm25.idf(self.n_docs, self.df[e]))
                        * (bm25.K1 + 1.0)
                        * float(bm25.tf_norm(tf, self.dl[d], self.avgdl))
                    )
                    best = se if best is None else max(best, se)
            if best is not None:
                s = (self._score_and(d, qterms_fixed) if fixed else 0.0)
                hits.append((d, s + best))
        ranked = sorted(hits, key=lambda kv: (-kv[1], self.doc_ids[kv[0]]))
        return [(self.doc_ids[d], s) for d, s in ranked[:k]]

    def dis_max_topk(self, clause_queries: list[str], k: int = 10,
                     tie_breaker: float = 0.0):
        """ES dis_max over OR-match clauses: score = best clause score +
        tie_breaker * sum of the other matching clauses' scores."""
        per_doc: dict[int, list[float]] = {}
        for q in clause_queries:
            qtoks = analysis.tokenize_series(pd.Series([q]))[0]
            scores: dict[int, float] = {}
            for t, qtf in sorted(Counter(qtoks).items()):
                if t not in self.postings:
                    continue
                w = (float(bm25.idf(self.n_docs, self.df[t]))
                     * (bm25.K1 + 1.0) * qtf)
                for d, tf in self.postings[t]:
                    s = w * float(bm25.tf_norm(tf, self.dl[d], self.avgdl))
                    scores[d] = scores.get(d, 0.0) + s
            for d, s in scores.items():
                per_doc.setdefault(d, []).append(s)
        out = {
            d: max(ss) + tie_breaker * (sum(ss) - max(ss))
            for d, ss in per_doc.items()
        }
        ranked = sorted(out.items(), key=lambda kv: (-kv[1], self.doc_ids[kv[0]]))
        return [(self.doc_ids[d], s) for d, s in ranked[:k]]

    def span_first_topk(self, term: str, end: int, k: int = 10):
        """span_first: term occurs within the first `end` token positions
        (0-based pos < end); scored as the term's qtf=1 BM25."""
        t = term.lower()
        if t not in self.postings:
            return []
        w = float(bm25.idf(self.n_docs, self.df[t])) * (bm25.K1 + 1.0)
        hits = []
        for d, tf in self.postings[t]:
            if t in self.toks[d][:end]:
                hits.append(
                    (d, w * float(bm25.tf_norm(tf, self.dl[d], self.avgdl)))
                )
        ranked = sorted(hits, key=lambda kv: (-kv[1], self.doc_ids[kv[0]]))
        return [(self.doc_ids[d], s) for d, s in ranked[:k]]

    def rescore_topk(self, query: str, k: int = 10, window_size: int = 50,
                     query_weight: float = 1.0, rescore_weight: float = 1.0):
        """ES rescore (phrase second pass): deterministic top-window by
        (score desc, doc_id), final = qw*score + rw*phrase_AND_score for
        docs containing the full query as a consecutive phrase."""
        base = self.topk(query, k=10**9)
        window = base[:window_size]
        ph = dict(self.phrase_topk(query, k=10**9))
        out = [
            (d, query_weight * s + rescore_weight * ph.get(d, 0.0))
            for d, s in window
        ]
        out.sort(key=lambda kv: (-kv[1], kv[0]))
        return out[:k]

    def boosting_topk(self, positive: str, negative: str, k: int = 10,
                      negative_boost: float = 0.5):
        """ES boosting query: positive OR-match; a doc also matching the
        negative query keeps its position with score × negative_boost."""
        pos = dict(self.topk(positive, k=10**9))
        neg_docs = (
            {d for d, _ in self.topk(negative, k=10**9)} if negative else set()
        )
        out = {
            d: s * negative_boost if d in neg_docs else s
            for d, s in pos.items()
        }
        ranked = sorted(out.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]

    def query_string_topk(self, q: str, k: int = 10):
        """simple_query_string subset: +must -not "phrase" should. A doc
        needs all must terms, all phrases, no must_not term, and >=1 should
        term when there is no must/phrase; score = BM25(must) + BM25(matched
        should) + each phrase's AND score."""
        from dynamo2es_lambda_spark.plans.search import parse_query_string

        p = parse_query_string(q)
        must_terms = sorted(Counter(p["must"]).items())
        should_terms = sorted(Counter(p["should"]).items())
        mnot = set(p["must_not"])
        hits = []
        for d, dt in enumerate(self.toks):
            dset = set(dt)
            if any(t in dset for t in mnot):
                continue
            if any(t not in dset for t, _ in must_terms):
                continue
            ok_ph, p_score = True, 0.0
            for ph in p["phrases"]:
                ptoks = list(analysis.tokenize_series(pd.Series([ph]))[0])
                n = len(ptoks)
                if not any(
                    dt[i: i + n] == ptoks for i in range(len(dt) - n + 1)
                ):
                    ok_ph = False
                    break
                p_score += self._score_and(
                    d, sorted(Counter(ptoks).items())
                )
            if not ok_ph:
                continue
            sh_matched = [(t, c) for t, c in should_terms if t in dset]
            if not must_terms and not p["phrases"] and should_terms and \
                    not sh_matched:
                continue
            s = p_score
            if must_terms:
                s += self._score_and(d, must_terms)
            if sh_matched:
                s += self._score_and(d, sh_matched)
            hits.append((d, s))
        ranked = sorted(hits, key=lambda kv: (-kv[1], self.doc_ids[kv[0]]))
        return [(self.doc_ids[d], s) for d, s in ranked[:k]]

    def terms_topk(self, terms: list[str], k: int = 10,
                   constant_score=None):
        """ES term/terms: exact dictionary terms (no analysis), qtf=1
        OR-score; constant_score makes every match score that boost and
        rank purely on doc_id."""
        scores: dict[int, float] = {}
        for t in sorted(set(x.lower() for x in terms)):
            if t not in self.postings:
                continue
            w = float(bm25.idf(self.n_docs, self.df[t])) * (bm25.K1 + 1.0)
            for d, tf in self.postings[t]:
                s = w * float(bm25.tf_norm(tf, self.dl[d], self.avgdl))
                scores[d] = scores.get(d, 0.0) + s
        if constant_score is not None:
            ranked = sorted(scores, key=lambda d: self.doc_ids[d])
            return [(self.doc_ids[d], float(constant_score))
                    for d in ranked[:k]]
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], self.doc_ids[kv[0]]))
        return [(self.doc_ids[d], s) for d, s in ranked[:k]]

    def function_score_topk(self, query: str, k: int = 10,
                            modifier: str = "log1p",
                            factor_weight: float = 1.0,
                            boost_mode: str = "multiply"):
        """ES function_score field_value_factor over the doc length."""
        base = dict(
            (d, s) for dd, s in self.topk(query, k=10**9)
            for d in [self.doc_ids.index(dd)]
        )
        out = {}
        for d, s in base.items():
            raw = factor_weight * float(self.dl[d])
            f = {"none": raw, "log1p": np.log1p(raw),
                 "sqrt": np.sqrt(raw)}[modifier]
            out[d] = s * f if boost_mode == "multiply" else s + f
        ranked = sorted(out.items(), key=lambda kv: (-kv[1], self.doc_ids[kv[0]]))
        return [(self.doc_ids[d], s) for d, s in ranked[:k]]

    def prefix_topk(self, prefix: str, k: int = 10, max_expansions=None):
        """ES prefix query with scoring_boolean rewrite: expand, OR-score."""
        terms = sorted(t for t in self.postings if t.startswith(prefix))
        if max_expansions is not None:
            terms = terms[:max_expansions]
        scores: dict[int, float] = {}
        for t in terms:
            w = float(bm25.idf(self.n_docs, self.df[t])) * (bm25.K1 + 1.0)
            for d, tf in self.postings[t]:
                s = w * float(bm25.tf_norm(tf, self.dl[d], self.avgdl))
                scores[d] = scores.get(d, 0.0) + s
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], self.doc_ids[kv[0]]))
        return [(self.doc_ids[d], s) for d, s in ranked[:k]]
