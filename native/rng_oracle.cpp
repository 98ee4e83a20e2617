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
#include <unordered_set>

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

// ---------------------------------------------------------------------------
// std::unordered_set<int> handles.
//
// Several reference generators make RNG-indexed choices over containers whose
// *order* comes from libstdc++ unordered_set iteration: jumper/caveflyer build
// `free_cells` by iterating `best_room` (games/jumper/tilemap.cpp:146-151,
// games/caveflyer/tilemap.cpp:155-160), and chaser takes the *first* element
// of `selected_indices` as the agent spawn and the rest as eggs
// (games/chaser/tilemap.cpp:195-213). That order is an implementation detail
// of libstdc++'s _Hashtable (bucket-count growth, insert-at-bucket-head), so
// the only robust oracle is libstdc++ itself: Python replays the reference's
// exact insertion sequence into a real unordered_set and reads back the
// iteration order.
// ---------------------------------------------------------------------------

static constexpr int kMaxSets = 64;
static std::unordered_set<int32_t> g_sets[kMaxSets];
static bool g_set_used[kMaxSets] = {false};

int32_t uset_create() {
    for (int i = 0; i < kMaxSets; i++) {
        if (!g_set_used[i]) {
            g_set_used[i] = true;
            // Reconstruct rather than clear(): clear() keeps the grown
            // bucket array, and _Hashtable iteration order depends on
            // bucket count — a reused handle would replay a *different*
            // iteration order than the reference's freshly-constructed
            // set (games/chaser/tilemap.cpp:183, room_generator.cpp),
            // silently corrupting every layout after the first.
            g_sets[i] = std::unordered_set<int32_t>();
            return i;
        }
    }
    return -1;
}

void uset_destroy(int32_t h) {
    if (h >= 0 && h < kMaxSets) {
        g_sets[h] = std::unordered_set<int32_t>();
        g_set_used[h] = false;
    }
}

void uset_clear(int32_t h) { g_sets[h].clear(); }

void uset_insert(int32_t h, int32_t v) { g_sets[h].insert(v); }

void uset_insert_batch(int32_t h, const int32_t* vals, int32_t n) {
    for (int32_t i = 0; i < n; i++) g_sets[h].insert(vals[i]);
}

int32_t uset_contains(int32_t h, int32_t v) {
    return g_sets[h].count(v) ? 1 : 0;
}

int32_t uset_size(int32_t h) { return (int32_t)g_sets[h].size(); }

// Fill `out` (capacity `cap`) with the set's elements in iteration order
// (begin -> end); returns the number written.
int32_t uset_iterate(int32_t h, int32_t* out, int32_t cap) {
    int32_t n = 0;
    for (int32_t v : g_sets[h]) {
        if (n >= cap) break;
        out[n++] = v;
    }
    return n;
}

// Copy-assign src into dst, mirroring `best_room = next_room`
// (games/jumper/room_generator.cpp:158-162) so the copy's iteration order is
// whatever libstdc++'s copy constructor produces.
void uset_assign(int32_t dst, int32_t src) { g_sets[dst] = g_sets[src]; }

int32_t rng_oracle_version() { return 2; }

}  // extern "C"
