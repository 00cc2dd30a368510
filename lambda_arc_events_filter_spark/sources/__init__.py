"""Sources & sinks: batch readers, streaming sources, the Kinesis adapter."""
