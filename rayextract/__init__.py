"""rayextract — a Ray-Data-native main-content extraction engine.

A brand-new engine (NOT a port) with the query/extraction capabilities of the
reference repo vijay-chaudhari/TextExtraction (C#/.NET, see SURVEY.md), re-expressed
as streaming ``ray.data.Dataset`` pipelines over zero-copy Arrow batches:

- content normalization / keyword gating   (reference F1-F3, TextExtraction/FilterData.cs)
- HTML boilerplate stripping               (D2 analog of the OCR stage, Worker.cs:144-200)
- PDF-ish layout / reading-order parsing   (D1 analog, Pdf-To-ImageStream/Convert.cs)
- date + entity span tagging               (F4-F7, NameRecognizer/EntityRecognizer.cs)
- field extractors, first-match-wins fold  (E1-E9, TextExtraction/Model/*.cs, Worker.cs:201-458)
- resumable partitioned parquet sink       (K1/K3 analog, Services/DbHelper.cs, Worker.cs:529)

plus the large-scale training-data operators a 100 TB pipeline needs: exact and
near dedup (MinHash-LSH / SimHash / n-gram Jaccard / embedding cosine), ANN
similarity search, text statistics (lang-id, quality, tokens, fingerprints),
and multimodal binary-column plumbing.

Design rules (see SURVEY.md §7):
- every per-row transform is ``map_batches`` over ``pyarrow`` batches;
- stateful stages (parsers, taggers) are callable classes run as actor pools;
- exactly one logical shuffle: the salted ``groupby(conv_id)`` fold;
- no driver-side materialization of the corpus; sinks are partitioned parquet
  with a manifest for resume.
"""

__version__ = "0.1.0"
