"""Sources: corpus readers and raw-payload extraction (the analog of the
reference's MarcReader decorator chain, ``MarcHandler.java:355-473``)."""
