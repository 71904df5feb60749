"""Engine configuration (mirrors the reference's HOCON surface,
Configuration.scala:16-71 / reference.conf, as plain dataclasses)."""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class SectionRank:
    """Per-section importance (reference.conf:24-32)."""

    section: str
    rank: int
    weight: float


# publication-section-ranks (reference.conf:24-32)
DEFAULT_SECTION_RANKS: list[SectionRank] = [
    SectionRank("title", 1, 1.0),
    SectionRank("abstract", 1, 0.8),
    SectionRank("concl", 1, 0.7),
    SectionRank("results", 2, 0.6),
    SectionRank("discuss", 2, 0.5),
    SectionRank("methods", 3, 0.3),
    SectionRank("other", 4, 0.1),
]


@dataclass(frozen=True)
class Word2VecConfig:
    """embedding.model-configuration (reference.conf:84-90) + an
    explicit seed for test reproducibility (SURVEY.md §7.5)."""

    window_size: int = 10
    num_partitions: int = 16
    max_iter: int = 3
    min_count: int = 1
    step_size: float = 0.02
    vector_size: int = 100
    seed: int | None = 42


@dataclass(frozen=True)
class EvidenceConfig:
    """evidence section (reference.conf:113)."""

    threshold: float = 0.01


@dataclass(frozen=True)
class PipelineConfig:
    section_ranks: list[SectionRank] = field(
        default_factory=lambda: list(DEFAULT_SECTION_RANKS)
    )
    word2vec: Word2VecConfig = field(default_factory=Word2VecConfig)
    evidence: EvidenceConfig = field(default_factory=EvidenceConfig)
