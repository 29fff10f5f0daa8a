from .progressive import align_progressive, extract_alignment, ProgressiveResult
