"""Enable the persistent JAX compilation cache (shared across processes;
critical under the remote-compile tunnel where cold compiles take
minutes)."""
import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
