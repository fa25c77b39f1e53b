"""Stream-tail orchestration: micro-batch replay loop and Structured
Streaming wrapper."""
