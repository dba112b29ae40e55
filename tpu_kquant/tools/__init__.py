"""CLI tools: generate, perplexity, bench (llama-bench table format)."""
