"""Sentence-to-graph retrieval side task (pysgg/image_retrieval)."""

from .model import SGEncode, retrieval_recall, triplet_loss
