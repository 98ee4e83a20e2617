// rng_oracle: bit-exact replay of the reference engines' RNG draw streams.
//
// The reference games draw all randomness from one std::mt19937 through
// libstdc++'s std::uniform_{int,real}_distribution in a fixed call order
// (e.g. games/maze/maze.cpp:34,310-317 seeds it; tilemap.cpp:62-101 and
// maze_generator.cpp:55-139 consume it during level generation). jax.random
// cannot be seed-matched to that stream, so fixed-seed *layout* parity with
// a compiled reference .so needs an oracle that reproduces the exact draws.
//
// This library exposes seeded mt19937 handles plus the two distribution
// shapes the games use, with libstdc++'s exact algorithms (this file simply
// uses libstdc++ itself — the authoritative implementation). Python drives
// it over ctypes (procgen2_tpu.tools.rng_oracle) to replay a game's
// generation-time draw sequence and predict the level layout for any seed,
// which the parity tests then compare against both the JAX generator's
// *distributional* behavior and (when a reference .so is available) the
// reference's actual layouts.
//
// Build: see native/Makefile (g++ -shared -fPIC, no dependencies).

#include <cstdint>
#include <random>

extern "C" {

// Opaque handle pool: fixed slots, no allocation surprises across the FFI.
static constexpr int kMaxHandles = 64;
static std::mt19937 g_rngs[kMaxHandles];
static bool g_used[kMaxHandles] = {false};

// Create a generator seeded like cenv_make/cenv_reset do
// (games/maze/maze.cpp:310-317: rng.seed(seed)).
int32_t rng_create(uint32_t seed) {
    for (int i = 0; i < kMaxHandles; i++) {
        if (!g_used[i]) {
            g_used[i] = true;
            g_rngs[i].seed(seed);
            return i;
        }
    }
    return -1;
}

void rng_seed(int32_t h, uint32_t seed) {
    if (h >= 0 && h < kMaxHandles) g_rngs[h].seed(seed);
}

void rng_destroy(int32_t h) {
    if (h >= 0 && h < kMaxHandles) g_used[h] = false;
}

// Raw 32-bit draw (mt19937 output).
uint32_t rng_raw(int32_t h) { return g_rngs[h](); }

// std::uniform_int_distribution<int>(lo, hi)(rng) — the only integer
// distribution shape the reference uses (inclusive bounds). A fresh
// distribution object per call matches the reference, which constructs
// them at every use site (e.g. tilemap.cpp:62-63).
int32_t rng_uniform_int(int32_t h, int32_t lo, int32_t hi) {
    std::uniform_int_distribution<int32_t> dist(lo, hi);
    return dist(g_rngs[h]);
}

// std::uniform_real_distribution<float>(lo, hi)(rng) — the float
// distribution shape the reference uses (e.g. dist01 in tilemap.cpp:95).
float rng_uniform_float(int32_t h, float lo, float hi) {
    std::uniform_real_distribution<float> dist(lo, hi);
    return dist(g_rngs[h]);
}

// Batch helpers so Python can pull whole draw sequences in one call.
void rng_uniform_int_batch(int32_t h, int32_t lo, int32_t hi, int32_t n,
                           int32_t* out) {
    std::uniform_int_distribution<int32_t> dist(lo, hi);
    for (int32_t i = 0; i < n; i++) out[i] = dist(g_rngs[h]);
}

void rng_uniform_float_batch(int32_t h, float lo, float hi, int32_t n,
                             float* out) {
    std::uniform_real_distribution<float> dist(lo, hi);
    for (int32_t i = 0; i < n; i++) out[i] = dist(g_rngs[h]);
}

int32_t rng_oracle_version() { return 1; }

}  // extern "C"
