"""Binary persistence: full-index snapshot with checksum validation.

Behavioral reference: Infidex ``Indexing/IndexPersistence.cs`` (format
"INFDX2" v2: magic + version + flags + counts + checksum, length-prefixed
data block, WordMatcher trailer appended by the facade) and
``SearchEngine.Load`` (SearchEngine.cs:399-442): derived statistics
(doc lengths, avgdl, word-level idf, metadata cache) are deliberately
RECOMPUTED on load so saved+loaded engines rank identically to in-memory
ones.

Format here: magic ``IFDXTPU2`` + version + CRC32-checksummed payload in
the safe tagged binary codec (``utils/safe_codec.py`` — a pure data
format; decoding constructs only primitives/containers/ndarrays, so a
tampered index file cannot execute code, matching the reference's
INFDX2 safety posture). The payload stores the raw postings (CSR image +
term texts), documents, word-matcher tables and short-query index;
device tensors are re-uploaded on load.
"""

from __future__ import annotations

import dataclasses
import struct
import zlib
from typing import Optional

import numpy as np

from ..utils.safe_codec import CodecError, decode as _codec_decode, encode as _codec_encode

MAGIC = b"IFDXTPU2"
VERSION = 3


class IndexFormatError(Exception):
    pass


def _doc_state(doc) -> tuple:
    fields_state = []
    for f in doc.fields:
        fields_state.append(dict(
            name=f.name, value=f.value, weight=int(f.weight),
            indexable=f.indexable, filterable=f.filterable, sortable=f.sortable,
            facetable=f.facetable, word_indexing=f.word_indexing,
            optional=f.optional, is_array=f.is_array,
            weight_as_float=f.weight_as_float,
            preload_filters=f.preload_filters,
        ))
    return (doc.document_key, doc.segment_number, doc.indexed_text,
            doc.document_client_information, doc.deleted, fields_state,
            doc.fields.name_of_document_key_field)


def _restore_doc(state) -> "Document":
    from ..api.fields import DocumentFields, Field, Weight
    from ..core.documents import Document

    (key, segment, indexed_text, client_info, deleted, fields_state,
     key_field_name) = state
    fields = DocumentFields()
    fields.name_of_document_key_field = key_field_name
    for fs in fields_state:
        fields.add_field(Field(
            fs["name"], fs["value"], Weight(fs["weight"]),
            indexable=fs["indexable"], filterable=fs["filterable"],
            sortable=fs["sortable"], facetable=fs["facetable"],
            word_indexing=fs["word_indexing"], optional=fs["optional"],
            is_array=fs["is_array"], weight_as_float=fs["weight_as_float"],
            preload_filters=fs["preload_filters"]))
    doc = Document(key, fields, segment_number=segment,
                   document_client_information=client_info)
    doc.indexed_text = indexed_text
    doc.deleted = deleted
    return doc


def _wm_state_encodable(state: dict) -> dict:
    """WordMatcher state with the setup dataclass flattened to a dict."""
    state = dict(state)
    setup = state.get("setup")
    if setup is not None and dataclasses.is_dataclass(setup):
        state["setup"] = dataclasses.asdict(setup)
    return state


def save_engine(engine, file_path: str) -> None:
    model = engine.vector_model
    if model.built is None:
        model.build_inverted_lists()

    # Persist the UNIFIED vocabulary (memory + any flushed segments): a
    # loaded engine is a consolidated in-memory index, mirroring the
    # reference's save of the memory image.
    term_state = [(term, int(model.built.df[tid]))
                  for tid, term in enumerate(model.built.terms)]

    payload = {
        "version": VERSION,
        "engine_config": engine._engine_config,
        "documents": [_doc_state(model.documents.get_document(i))
                      for i in range(len(model.documents))],
        "terms": term_state,
        "term_offsets": model.built.term_offsets,
        "postings_docs": model.built.postings_docs,
        "postings_weights": model.built.postings_weights,
        "short_query_index": (model.short_query_index.state_dict()
                              if model.short_query_index is not None else None),
        "word_matcher": (_wm_state_encodable(engine.word_matcher.state_dict())
                         if engine.word_matcher is not None else None),
        "schema": (_doc_state_schema(engine.document_field_schema)
                   if engine.document_field_schema is not None else None),
        "synonyms": (engine.synonym_map.state_dict()
                     if engine.synonym_map is not None else None),
    }

    blob = _codec_encode(payload)
    checksum = zlib.crc32(blob) & 0xFFFFFFFF
    with open(file_path, "wb") as fh:
        fh.write(MAGIC)
        fh.write(struct.pack("<II", VERSION, checksum))
        fh.write(struct.pack("<Q", len(blob)))
        fh.write(blob)


def _doc_state_schema(schema):
    dummy = type("D", (), {})()
    dummy.fields = schema
    dummy.document_key = 0
    dummy.segment_number = 0
    dummy.indexed_text = ""
    dummy.document_client_information = None
    dummy.deleted = False
    return _doc_state(dummy)


def load_engine(file_path: str, **engine_kwargs):
    from ..engine import SearchEngine, SearchEngineStatus

    with open(file_path, "rb") as fh:
        magic = fh.read(len(MAGIC))
        if magic != MAGIC:
            raise IndexFormatError(f"bad magic: {magic!r}")
        version, checksum = struct.unpack("<II", fh.read(8))
        if version != VERSION:
            raise IndexFormatError(f"unsupported version {version}")
        (length,) = struct.unpack("<Q", fh.read(8))
        blob = fh.read(length)
        if (zlib.crc32(blob) & 0xFFFFFFFF) != checksum:
            raise IndexFormatError("checksum mismatch: index file is corrupt")
        try:
            payload = _codec_decode(blob)
        except CodecError as exc:
            raise IndexFormatError(f"malformed index payload: {exc}") from exc

    cfg = dict(payload["engine_config"])
    cfg.update(engine_kwargs)

    from ..core.config import WordMatcherSetup

    has_wm = payload["word_matcher"] is not None
    wm_setup = cfg.pop("word_matcher_setup", None)
    if has_wm and wm_setup is None:
        stored = payload["word_matcher"]["setup"]
        if isinstance(stored, dict):
            stored = WordMatcherSetup(**stored)
        wm_setup = stored
    if not has_wm and wm_setup is not None:
        raise IndexFormatError("index file is missing required WordMatcher data")

    engine = SearchEngine(word_matcher_setup=wm_setup, **cfg)
    engine.status = SearchEngineStatus.LOADING
    model = engine.vector_model

    # Restore documents
    for state in payload["documents"]:
        model.documents.add_document(_restore_doc(state))

    # Restore terms + raw postings from the CSR image
    offsets = payload["term_offsets"]
    docs = payload["postings_docs"]
    weights = payload["postings_weights"]
    for tid, (term, df) in enumerate(payload["terms"]):
        new_id, _ = model.term_dict.get_or_add(term)
        assert new_id == tid
        p = model.term_dict.postings[tid]
        p.df = df
        s, e = int(offsets[tid]), int(offsets[tid + 1])
        p.doc_ids = docs[s:e].tolist()
        p.weights = weights[s:e].tolist()

    if payload["short_query_index"] is not None and model.short_query_index is not None:
        model.short_query_index.load_state_dict(payload["short_query_index"])

    if has_wm and engine.word_matcher is not None:
        engine.word_matcher.load_state_dict(payload["word_matcher"])
    elif has_wm and engine.word_matcher is None:
        raise IndexFormatError(
            "index contains WordMatcher data but engine is configured without it")

    if payload.get("schema") is not None:
        engine._document_field_schema = _restore_doc(payload["schema"]).fields

    if payload.get("synonyms") is not None:
        from ..synonyms import SynonymMap

        sm = SynonymMap()
        sm.load_state_dict(payload["synonyms"])
        engine._synonym_map = sm
        model.synonym_map = sm

    # Rebuild ALL derived statistics, exactly like SearchEngine.Load
    # (doc lengths, avgdl, idf caches, device tensors, metadata cache).
    model.calculate_weights()
    model.build_optimized_indexes()
    engine._rebuild_short_query_resolver()
    engine._mark_indexed()
    engine.status = SearchEngineStatus.READY
    return engine
