"""Reusable operator compositions that Spark lacks as built-ins
(dedup sketches, similarity search, multimodal plumbing).  Each is a
pure DataFrame→DataFrame function; plans/ registers them as queries."""
