"""RAG-Gesture/TPU: TPU-native retrieval-augmented co-speech gesture synthesis."""
