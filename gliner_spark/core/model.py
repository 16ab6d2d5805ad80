"""GlinerSparkModel — broadcastable, torch-free scoring model.

Reproduces the reference's inference dataflow exactly
(gliner/model.py:2253-2331 inference; gliner/modeling/base.py:414-488
forward; gliner/decoding/decoder.py:332-524 decode):

    tokenize -> enumerate candidate spans (L x K, end-inclusive)
    -> span representations -> matmul against the label prompt matrix
       (per-doc slice of einsum("BLKD,BCD->BLKC"), base.py:474)
    -> sigmoid + threshold -> greedy non-overlap decode
    -> char-offset mentions.

Encoder stand-in
----------------
This container has no torch/transformers, so the *encoder* (the part of
GLiNER that turns text into vectors — learned weights) is replaced by a
deterministic construction with the same interface:

- every candidate span's representation is the hash unit vector of its
  normalized surface form (random direction, near-orthogonal to everything);
- surfaces the model "knows" (its gazetteer — the analog of what a trained
  encoder has learned) are instead assigned distinct orthonormal basis
  directions, and each entity-type prompt embedding is the sum of its
  member-surface directions.

Hence dot(span_rep, label_emb) == 1.0 exactly for a known surface of that
type, ~N(0, sqrt(n/D)) otherwise — the matmul score head, thresholding and
decoding then behave exactly like the reference's, with a perfectly
characterized score distribution. A real encoder (ONNX/torch on executors)
plugs in behind the same ``span_vecs``/``label_matrix`` seam without
touching any Spark code; see core/heads.py for the MarkerV0 head kept for
architectural parity.

Relation scoring mirrors the relex variant (modeling/base.py:2256-2495 with
relations_layer="none", config.py:217-219 — all directed pairs i != j, no
adjacency pruning; build_all_entity_pairs, modeling/utils.py:294-353): the
pair representation is the hash vector of the connective phrase strictly
between head and tail, scored against the relation prompt matrix by the
same matmul -> sigmoid -> threshold path.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

import hashlib

from gliner_spark.config import PipelineConfig
from gliner_spark.core.decode import decode_candidates, decode_scores, sigmoid
from gliner_spark.core.spans import Span, enumerate_spans
from gliner_spark.core.tokenization import tokenize_with_offsets


def _hash_bytes(s: str, seed: int) -> bytes:
    return hashlib.blake2b(f"{seed}\x00{s}".encode("utf-8"), digest_size=20).digest()


def normalize_surface(s: str) -> str:
    return " ".join(s.lower().split())


@dataclass
class GlinerSparkModel:
    """Deterministic scoring model. Pickles cleanly -> sc.broadcast once.

    The label prompt matrices are precomputed/frozen exactly like the
    reference's compress_prompt_embeddings mode (model.py:2455-2541,
    base.py:83-121): labels are embedded once on the driver and broadcast,
    never recomputed per batch.
    """

    config: PipelineConfig
    labels: List[str]                      # entity types, order = class id - 1
    relations: List[str]                   # relation labels
    label_matrix: np.ndarray               # (C, D) float32
    rel_matrix: np.ndarray                 # (R, D) float32
    known_surfaces: Dict[str, int]         # normalized surface -> basis dim
    known_patterns: Dict[str, int]         # normalized connective -> basis dim

    # ----- construction -------------------------------------------------
    @staticmethod
    def from_gazetteer(
        gazetteer: Dict[str, Sequence[str]],
        relation_patterns: Dict[str, Sequence[str]],
        config: Optional[PipelineConfig] = None,
    ) -> "GlinerSparkModel":
        """Build the frozen prompt matrices from a type->surfaces gazetteer
        and a relation->connective-phrases map (the 'weights')."""
        cfg = config or PipelineConfig()
        D = cfg.dim
        labels = list(dict.fromkeys(gazetteer.keys()))  # order-preserving dedup
        relations = list(dict.fromkeys(relation_patterns.keys()))

        known_surfaces: Dict[str, int] = {}
        label_matrix = np.zeros((len(labels), D), dtype=np.float32)
        dim_cursor = 0
        for ci, lab in enumerate(labels):
            for s in gazetteer[lab]:
                ns = normalize_surface(s)
                if ns in known_surfaces:
                    raise ValueError(f"surface {ns!r} assigned to two types")
                known_surfaces[ns] = dim_cursor
                label_matrix[ci, dim_cursor] = 1.0
                dim_cursor += 1

        known_patterns: Dict[str, int] = {}
        rel_matrix = np.zeros((len(relations), D), dtype=np.float32)
        for ri, rel in enumerate(relations):
            for p in relation_patterns[rel]:
                np_ = normalize_surface(p)
                if np_ not in known_patterns:
                    known_patterns[np_] = dim_cursor
                    dim_cursor += 1
                rel_matrix[ri, known_patterns[np_]] = 1.0

        if dim_cursor >= D // 2:
            raise ValueError(
                f"gazetteer needs {dim_cursor} basis dims; dim={D} leaves too "
                f"little room for the random-hash subspace"
            )
        return GlinerSparkModel(
            config=cfg,
            labels=labels,
            relations=relations,
            label_matrix=label_matrix,
            rel_matrix=rel_matrix,
            known_surfaces=known_surfaces,
            known_patterns=known_patterns,
        )

    # ----- encoder ------------------------------------------------------
    def _surface_vec(self, norm: str, cache: Dict[str, np.ndarray]) -> np.ndarray:
        v = cache.get(norm)
        if v is not None:
            return v
        k = self.known_surfaces.get(norm)
        if k is None:
            k = self.known_patterns.get(norm)
        v = np.zeros(self.config.dim, dtype=np.float32)
        if k is not None:
            v[k] = 1.0
        else:
            # unknown surface: sparse pseudo-random direction confined to the
            # non-gazetteer subspace, so it can never alias a known basis dim
            # (its dot with every prompt row is exactly 0 — the stand-in's
            # analog of a low encoder score). Sparse keeps hashing ~1us.
            lo = len(self.known_surfaces) + len(self.known_patterns)
            width = self.config.dim - lo
            h = _hash_bytes(norm, self.config.seed)
            idx = lo + (np.frombuffer(h[:16], dtype="<u4") % width)
            sgn = np.where(np.frombuffer(h[16:20], dtype="u1") & 1, 0.5, -0.5)
            v[idx] = sgn.astype(np.float32)
        cache[norm] = v
        return v

    def span_vecs(
        self,
        tokens: List[str],
        span_idx: np.ndarray,
        valid: np.ndarray,
        cache: Dict[str, np.ndarray],
    ) -> np.ndarray:
        """(S, D) span representations; invalid spans get zero vectors."""
        D = self.config.dim
        out = np.zeros((span_idx.shape[0], D), dtype=np.float32)
        low = [t.lower() for t in tokens]
        for i in np.nonzero(valid)[0]:
            s, e = span_idx[i, 0], span_idx[i, 1]
            out[i] = self._surface_vec(" ".join(low[s : e + 1]), cache)
        return out

    # ----- fast score path ----------------------------------------------
    # The dense matmul above is mathematically a gather here: prompt rows are
    # zero outside the gazetteer basis subspace, so an unknown span scores a
    # constant sigmoid(-bias*scale) and a known span scores the precomputed
    # sigmoid row of its basis dim. predict_doc uses the gather; the dense
    # einsum path (span_vecs + score_spans) is kept and unit-tested equal —
    # the same fast-path==baseline discipline as the reference's packing test
    # (tests/test_infer_packing.py:52-77).
    def _sig_table(self) -> Tuple[np.ndarray, float]:
        if not hasattr(self, "_sig_cache"):
            cfg = self.config
            self._sig_cache = (
                sigmoid((self.label_matrix - cfg.score_bias) * cfg.score_scale)
                .astype(np.float64),
                float(sigmoid(np.array([-cfg.score_bias * cfg.score_scale]))[0]),
            )
        return self._sig_cache

    def _rel_sig_table(self) -> Tuple[np.ndarray, float]:
        if not hasattr(self, "_rel_sig_cache"):
            cfg = self.config
            self._rel_sig_cache = (
                sigmoid((self.rel_matrix - cfg.score_bias) * cfg.score_scale)
                .astype(np.float64),
                float(sigmoid(np.array([-cfg.score_bias * cfg.score_scale]))[0]),
            )
        return self._rel_sig_cache

    @property
    def max_known_width(self) -> int:
        if not hasattr(self, "_mkw"):
            widths = [len(s.split()) for s in self.known_surfaces] or [1]
            self._mkw = max(widths)
        return self._mkw

    @property
    def _known_first_words(self) -> frozenset:
        """First word of every gazetteer surface — the start-position prune
        for the scoring loop: a span starting at s can only score above
        base if low[s] opens some known surface, so non-opening starts
        skip the whole width loop (and its string building). Pure pruning:
        skipped cells keep the base prob, exactly what the full lookup
        would have produced (parity asserted by the fast-path==dense test
        and every extraction oracle gate)."""
        if not hasattr(self, "_kfw"):
            self._kfw = frozenset(
                s.split(" ", 1)[0] for s in self.known_surfaces
            )
        return self._kfw

    def _touched_cells(self, low: List[str], valid: np.ndarray):
        """Yield (row, basis_dim) for every valid span whose surface is a
        known gazetteer surface, in row-major span order — the sparse
        support of _probs_grid (every other cell holds the constant
        `base`). Shared by the dense grid and the sparse decode fast path
        so the two can never diverge."""
        n = len(low)
        K = self.config.max_width
        mkw = min(self.max_known_width, K)
        lookup = self.known_surfaces.get
        first_words = self._known_first_words
        for s in range(n):
            surface = low[s]
            if surface not in first_words:
                continue  # no known surface opens here
            row = s * K
            for w in range(min(mkw, n - s)):
                if w:
                    surface = surface + " " + low[s + w]
                if not valid[row + w]:
                    continue
                k = lookup(surface)
                if k is not None:
                    yield row + w, k

    def _probs_grid(self, tokens: List[str], span_idx: np.ndarray,
                    valid: np.ndarray) -> np.ndarray:
        """(S, C) sigmoid grid — gather-equivalent of the dense score head."""
        sig, base = self._sig_table()
        S = span_idx.shape[0]
        probs = np.full((S, sig.shape[0]), base, dtype=np.float64)
        low = [t.lower() for t in tokens]
        # only spans of width <= max gazetteer width can score above base;
        # `valid` is already implied by e = s+w <= n-1 here; an explicit
        # caller-restricted mask (allowed_spans) is applied by the caller
        # on the decoded grid via `valid`, which decode_scores consults.
        for row, k in self._touched_cells(low, valid):
            probs[row] = sig[:, k]
        return probs

    # ----- NER (per document) ------------------------------------------
    def predict_doc(
        self,
        text: str,
        cache: Optional[Dict[str, np.ndarray]] = None,
        labels: Optional[Sequence[str]] = None,
        allowed_spans: Optional[Sequence[Tuple[int, int]]] = None,
        threshold: Optional[float] = None,
        top_k_probs: int = 0,
    ) -> Tuple[List[dict], List[str], List[int], List[int]]:
        """Mentions for one document (reference predict_entities semantics,
        model.py:2333). Returns (mentions, tokens, starts, ends); mention
        char offsets are start-inclusive / end-exclusive (model.py:1955-61).

        labels: per-request label subset (zero-shot: entity types chosen at
            query time; order-preserving dedup like make_mapping,
            utils.py:182-212). Defaults to all model labels.
        allowed_spans: word-level (start, end_inclusive) restriction —
            scoring limited to caller-specified spans (decoder.py:279-287,
            model.py:1887-1921).
        threshold: per-request override (per-sample thresholds,
            decoder.py:229-309).
        top_k_probs: attach top-k class probabilities per kept span
            (decoder.py:180-209).
        """
        cfg = self.config
        tokens, starts, ends = tokenize_with_offsets(text)
        if not tokens:
            return [], tokens, starts, ends
        span_idx, valid = enumerate_spans(len(tokens), cfg.max_width)
        if allowed_spans is not None:
            allow = set((int(s), int(e)) for s, e in allowed_spans)
            mask = np.array(
                [(int(s), int(e)) in allow for s, e in span_idx], dtype=bool
            )
            valid = valid & mask
        thr = cfg.threshold if threshold is None else threshold
        sig, base = self._sig_table()
        if labels is not None:
            use = list(dict.fromkeys(labels))  # order-preserving dedup
            cols = [self.labels.index(l) for l in use if l in self.labels]
            id_to_class = [self.labels[c] for c in cols]
        else:
            cols = None
            id_to_class = self.labels
        if top_k_probs == 0 and base <= thr:
            # Sparse decode fast path: every grid cell outside the gather
            # support holds the constant `base`, and `probs > thr` (strict)
            # excludes those cells whenever base <= thr — so the candidate
            # set is exactly the touched cells' above-threshold classes.
            # Emission stays row-major (rows ascending from _touched_cells,
            # classes ascending from nonzero), the same order the dense
            # grid's np.nonzero produces; decode_candidates is the shared
            # tail, so ordering and tie-breaks are bit-identical (asserted
            # by the fast-path==dense parity test and the oracle gates).
            low = [t.lower() for t in tokens]
            sig_sel = sig[cols, :] if cols is not None else sig
            s_l: list = []
            c_l: list = []
            p_l: list = []
            for row, k in self._touched_cells(low, valid):
                col = sig_sel[:, k]
                for c in np.nonzero(col > thr)[0]:
                    s_l.append(row)
                    c_l.append(int(c))
                    p_l.append(col[c])
            decoded = decode_candidates(
                np.array(s_l, dtype=np.int64),
                np.array(c_l, dtype=np.int64),
                np.array(p_l, dtype=np.float64),
                span_idx, id_to_class,
                flat_ner=cfg.flat_ner, multi_label=cfg.multi_label,
            )
            probs = None
        else:
            probs = self._probs_grid(tokens, span_idx, valid)
            if cols is not None:
                probs = probs[:, cols]
            decoded = decode_scores(
                probs, span_idx, valid, id_to_class,
                threshold=thr,
                flat_ner=cfg.flat_ner,
                multi_label=cfg.multi_label,
            )
        if top_k_probs:
            for sp in decoded:
                row = probs[sp.start * cfg.max_width + (sp.end - sp.start)]
                top = np.argsort(-row)[:top_k_probs]
                sp.class_probs = {id_to_class[c]: float(row[c]) for c in top}
        mentions = [
            {
                "start": starts[sp.start],
                "end": ends[sp.end],
                "text": text[starts[sp.start] : ends[sp.end]],
                "label": sp.entity_type,
                "score": sp.score,
                "word_start": sp.start,
                "word_end": sp.end,
                **({"class_probs": sp.class_probs} if sp.class_probs else {}),
            }
            for sp in decoded
        ]
        return mentions, tokens, starts, ends

    def predict_doc_dense(self, text: str) -> List[dict]:
        """Dense-matmul baseline path (the literal einsum form); used by the
        fast-path parity unit test. Returns the same mentions as predict_doc.
        """
        cfg = self.config
        tokens, starts, ends = tokenize_with_offsets(text)
        if not tokens:
            return []
        span_idx, valid = enumerate_spans(len(tokens), cfg.max_width)
        rep = self.span_vecs(tokens, span_idx, valid, {})
        probs = sigmoid((rep @ self.label_matrix.T - cfg.score_bias) * cfg.score_scale)
        decoded = decode_scores(
            probs.astype(np.float64), span_idx, valid, self.labels,
            threshold=cfg.threshold, flat_ner=cfg.flat_ner,
            multi_label=cfg.multi_label,
        )
        return [
            {
                "start": starts[sp.start], "end": ends[sp.end],
                "text": text[starts[sp.start] : ends[sp.end]],
                "label": sp.entity_type, "score": sp.score,
                "word_start": sp.start, "word_end": sp.end,
            }
            for sp in decoded
        ]

    # ----- prompted (composite-label) second pass -----------------------
    def predict_doc_composite(
        self,
        text: str,
        composite_labels: Sequence[str],
        pretokenized: Optional[Tuple[List[str], List[int], List[int]]] = None,
    ) -> List[dict]:
        """Second pass of the prompt-based RE pipeline (reference
        GLiNERRelationExtractor, multitask/relation_extraction.py:82-127):
        score spans against per-doc composite labels ``"{entity} <> {rel}"``
        and parse hits back into (source, relation, target).

        Deterministic-encoder semantics: a span scores above threshold for
        "X <> r" iff it is a gazetteer surface T immediately preceded by a
        connective phrase of r that is itself immediately preceded by an
        occurrence of X — the stand-in for what a trained model learns the
        composite label to mean. Scores are the same rel sigmoid-gather as
        predict_relations_doc. Char offsets are relative to the bare text:
        the frozen-prompt design never physically prepends the prompt, so
        the reference's return_index shift (relation_extraction.py:99-121)
        is identity here.
        """
        tokens, starts, ends = (
            pretokenized
            if pretokenized is not None
            else tokenize_with_offsets(text)
        )
        if not tokens:
            return []
        low = [t.lower() for t in tokens]
        n = len(low)
        sig, _base = self._rel_sig_table()
        out: List[dict] = []
        lookup = self.known_surfaces.get
        mkw = self.max_known_width
        thr = self.config.rel_threshold
        if not hasattr(self, "_rel_index"):
            # O(1) relation lookup + pre-split connective patterns (the
            # per-label .index()/.split() calls dominated the old loop)
            self._rel_index = {r: i for i, r in enumerate(self.relations)}
            self._pat_toks = [
                (p.split(), k) for p, k in self.known_patterns.items()
            ]
        rel_index = self._rel_index
        # group the composite labels by source so each source's token
        # scan and each occurrence's connective/target matching runs ONCE
        # and fans out over that source's relations — the emitted row
        # MULTISET is identical to the per-label loop (same conjunction
        # of conditions per (label, occurrence, phrase, width)), only the
        # emission order changes, which no consumer observes (rows are
        # set-compared / sorted downstream).
        by_src: Dict[str, List[Tuple[str, int]]] = {}
        for lab in dict.fromkeys(composite_labels):  # order-preserving dedup
            if "<>" not in lab:
                continue
            src_raw, rel_raw = lab.split("<>", 1)
            src, rel = normalize_surface(src_raw), rel_raw.strip()
            ri = rel_index.get(rel)
            if ri is None or not src:
                continue
            by_src.setdefault(src, []).append((rel, ri))
        for src, rels in by_src.items():
            st = src.split()
            L = len(st)
            for i in range(n - L + 1):
                if low[i : i + L] != st:
                    continue
                j = i + L
                for pt, k in self._pat_toks:
                    if low[j : j + len(pt)] != pt:
                        continue
                    t0 = j + len(pt)
                    targets = []
                    for w in range(1, min(mkw, n - t0) + 1):
                        surf = " ".join(low[t0 : t0 + w])
                        if lookup(surf) is not None:
                            targets.append((surf, starts[t0], ends[t0 + w - 1]))
                    if not targets:
                        continue
                    for rel, ri in rels:
                        sc = sig[ri, k]
                        if sc <= thr:
                            continue
                        for surf, s0, e0 in targets:
                            out.append(
                                {
                                    "source": src,
                                    "relation": rel,
                                    "target": surf,
                                    "score": float(sc),
                                    "start": s0,
                                    "end": e0,
                                }
                            )
        return out

    # ----- relations (per document) ------------------------------------
    def predict_relations_doc(
        self,
        tokens: List[str],
        mentions: List[dict],
        cache: Optional[Dict[str, np.ndarray]] = None,
    ) -> List[dict]:
        """Directed-pair relation scoring (single-step all-pairs mode).

        Mirrors build_all_entity_pairs + pair x rel-prompt matmul
        (modeling/utils.py:294-353, base.py:2404-2421). Pair context = the
        connective phrase strictly between head end and tail start, capped
        at rel_context_window tokens; pairs where tail precedes head or the
        gap exceeds the window score against a zero vector (no relation).
        """
        cfg = self.config
        cache = cache if cache is not None else {}
        E = len(mentions)
        if E < 2 or not self.relations:
            return []
        if E * (E - 1) > cfg.max_pairs_per_doc:
            # bound the E^2 blowup; keep highest-score mentions (reference
            # top-k entity selection, modeling/base.py:2174-2178)
            keep = sorted(
                range(E), key=lambda i: (-mentions[i]["score"], mentions[i]["word_start"])
            )[: int(np.sqrt(cfg.max_pairs_per_doc)) + 1]
            keep = sorted(keep)
            mentions = [mentions[i] for i in keep]
            E = len(mentions)

        sig, base = self._rel_sig_table()
        if base > cfg.rel_threshold:  # degenerate config; nothing to prune
            raise ValueError("rel_threshold below the no-context baseline score")

        allowed = None
        if cfg.adjacency_mode in ("mlp", "bilinear", "attn", "gcn", "gat"):
            # learned adjacency decoders (reference relations_layers.py:45-
            # 406) over the doc's entity vectors; keep pairs with
            # A[i, j] > adjacency_threshold. Weights are seeded arrays
            # (npz-loadable) cached per model instance.
            from gliner_spark.core.adjacency import adjacency, adjacency_weights

            if not hasattr(self, "_adj_w"):
                self._adj_w = {}
            w = self._adj_w.get(cfg.adjacency_mode)
            if w is None:
                w = adjacency_weights(cfg.adjacency_mode, cfg.dim, seed=cfg.seed)
                self._adj_w[cfg.adjacency_mode] = w
            x = np.stack(
                [
                    self._surface_vec(normalize_surface(m["text"]), cache)
                    for m in mentions
                ]
            )
            adj = adjacency(cfg.adjacency_mode, x, w)
            allowed = {
                (i, j)
                for i in range(E)
                for j in range(E)
                if i != j and adj[i, j] > cfg.adjacency_threshold
            }
        elif cfg.adjacency_mode == "dot":
            # adjacency-layer pair pruning (reference modeling/base.py:2373-
            # 2402 + build_entity_pairs modeling/utils.py:209-291): score all
            # directed pairs with a cheap adjacency head, keep adj > thr.
            # Deterministic stand-in for the learned dot adjacency: sigmoid
            # of a proximity kernel — pairs whose gap fits the context
            # window score > 0.5, others below (same keep/drop shape).
            allowed = set()
            for i in range(E):
                for j in range(E):
                    if i == j:
                        continue
                    gap = mentions[j]["word_start"] - (mentions[i]["word_end"] + 1)
                    adj = float(
                        sigmoid(
                            np.array([cfg.rel_context_window - gap + 0.5])
                        )[0]
                    ) if gap >= 0 else 0.0
                    if adj > cfg.adjacency_threshold:
                        allowed.add((i, j))

        low = [t.lower() for t in tokens]
        out = []
        for i in range(E):
            for j in range(E):
                if i == j:
                    continue
                if allowed is not None and (i, j) not in allowed:
                    continue
                h, t = mentions[i], mentions[j]
                gap0, gap1 = h["word_end"] + 1, t["word_start"]
                if not (0 < gap1 - gap0 <= cfg.rel_context_window):
                    continue  # empty/backward/too-far context scores `base`
                k = self.known_patterns.get(" ".join(low[gap0:gap1]))
                if k is None:
                    continue  # unknown connective: all rel scores == `base`
                col = sig[:, k]  # gather == dense pair-matmul row (see above)
                for r in np.nonzero(col > cfg.rel_threshold)[0]:
                    out.append(
                        {
                            "head_idx": i,
                            "tail_idx": j,
                            "relation": self.relations[int(r)],
                            "score": float(col[r]),
                        }
                    )
        return out
