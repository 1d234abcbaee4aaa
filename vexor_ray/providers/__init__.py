"""Embedding providers (network-backed + offline hash arm).

``make_provider(spec)`` turns a JSON-serializable spec dict — safe to
persist in build manifests, secrets stay in environment variables — into a
provider object with one method: ``embed(texts) -> np.ndarray`` (n, dim)
float32.  See ``openai_http.OpenAIEmbeddingProvider`` for the network arm.
"""

from .openai_http import (
    GeminiEmbeddingProvider,
    OpenAIEmbeddingProvider,
    ProviderError,
    VoyageEmbeddingProvider,
    make_provider,
)

__all__ = [
    "GeminiEmbeddingProvider",
    "OpenAIEmbeddingProvider",
    "ProviderError",
    "VoyageEmbeddingProvider",
    "make_provider",
]
