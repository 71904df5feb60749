"""The four reference pipeline steps re-expressed as PySpark plans:

* grounding+processing (``processing`` step): ground EPMC NER mentions
  against entity LUTs → matches / cooccurrences / failed* /
  literatureIndex,
* embedding: per-publication entity sets → Word2Vec model,
* vectors: model vector table with category + norm,
* evidence: target–disease evidence from embedding similarity and
  sentence co-occurrences.
"""
