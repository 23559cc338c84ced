// Native runtime components for qkan_implementation_tpu.
//
// C++ counterpart of the reference's native dependencies: a dense-QUBO
// simulated annealer with the same algorithm and energy convention as the
// on-device JAX annealer (anneal/sa.py) -- the role dwave-neal's C++
// sampler plays for the reference (DegreeOptimizer.py:236-237) -- plus a
// brute-force exact solver for small problems (test oracle) and a batch
// energy evaluator.
//
// Build:  g++ -O3 -march=native -shared -fPIC -o libqkan_native.so qkan_native.cpp
// ABI: plain C functions over double arrays; loaded via ctypes.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

// xorshift128+ PRNG: fast, reproducible across platforms.
struct Rng {
  uint64_t s0, s1;
  explicit Rng(uint64_t seed) {
    // splitmix64 seeding
    uint64_t z = seed + 0x9E3779B97F4A7C15ULL;
    auto next = [&z]() {
      z += 0x9E3779B97F4A7C15ULL;
      uint64_t r = z;
      r = (r ^ (r >> 30)) * 0xBF58476D1CE4E5B9ULL;
      r = (r ^ (r >> 27)) * 0x94D049BB133111EBULL;
      return r ^ (r >> 31);
    };
    s0 = next();
    s1 = next();
  }
  uint64_t next() {
    uint64_t x = s0, y = s1;
    s0 = y;
    x ^= x << 23;
    s1 = x ^ y ^ (x >> 17) ^ (y >> 26);
    return s1 + y;
  }
  double uniform() {  // [0, 1)
    return (next() >> 11) * (1.0 / 9007199254740992.0);
  }
};

double energy(int n, const double* h, const double* J, const double* s) {
  double e = 0.0;
  for (int i = 0; i < n; ++i) {
    if (s[i] == 0.0) continue;
    e += h[i];
    const double* Ji = J + (size_t)i * n;
    for (int j = i + 1; j < n; ++j) e += Ji[j] * s[j];
  }
  return e;
}

}  // namespace

extern "C" {

// Batched simulated annealing over E(s) = h.s + 1/2 s^T J s (J symmetric,
// zero diagonal).  Writes samples [num_reads, n] (0/1 doubles) and energies
// [num_reads] (offset NOT included; caller adds it).
void qkan_anneal(int n, int num_reads, int num_sweeps, const double* h,
                 const double* J, double beta0, double beta1, uint64_t seed,
                 double* out_samples, double* out_energies) {
  std::vector<double> betas(num_sweeps);
  if (num_sweeps == 1) {
    betas[0] = beta1;
  } else {
    double ratio = std::pow(beta1 / beta0, 1.0 / (num_sweeps - 1));
    double b = beta0;
    for (int t = 0; t < num_sweeps; ++t, b *= ratio) betas[t] = b;
  }

  std::vector<double> f(n);
  for (int r = 0; r < num_reads; ++r) {
    Rng rng(seed * 0x100000001B3ULL + (uint64_t)r);
    double* s = out_samples + (size_t)r * n;
    for (int i = 0; i < n; ++i) s[i] = rng.next() & 1 ? 1.0 : 0.0;
    // local fields f_i = h_i + sum_j J_ij s_j
    for (int i = 0; i < n; ++i) {
      double acc = h[i];
      const double* Ji = J + (size_t)i * n;
      for (int j = 0; j < n; ++j) acc += Ji[j] * s[j];
      f[i] = acc;
    }
    for (int t = 0; t < num_sweeps; ++t) {
      double beta = betas[t];
      for (int i = 0; i < n; ++i) {
        double de = (1.0 - 2.0 * s[i]) * f[i];
        bool accept = de <= 0.0 || rng.uniform() < std::exp(-beta * de);
        if (accept) {
          double delta = 1.0 - 2.0 * s[i];
          s[i] += delta;
          const double* Ji = J + (size_t)i * n;
          for (int j = 0; j < n; ++j) f[j] += delta * Ji[j];
        }
      }
    }
    out_energies[r] = energy(n, h, J, s);
  }
}

// Exact brute-force minimum for n <= 30 (test oracle).  Returns best energy
// and writes the argmin bits into out_sample.
double qkan_brute_force(int n, const double* h, const double* J,
                        double* out_sample) {
  double best = 1e300;
  uint64_t best_bits = 0;
  std::vector<double> s(n);
  for (uint64_t bits = 0; bits < (1ULL << n); ++bits) {
    for (int i = 0; i < n; ++i) s[i] = (bits >> i) & 1 ? 1.0 : 0.0;
    double e = energy(n, h, J, s.data());
    if (e < best) {
      best = e;
      best_bits = bits;
    }
  }
  for (int i = 0; i < n; ++i) out_sample[i] = (best_bits >> i) & 1 ? 1.0 : 0.0;
  return best;
}

// Batch energy evaluation: energies[r] = E(samples[r]).
void qkan_energies(int n, int num_samples, const double* h, const double* J,
                   const double* samples, double* out_energies) {
  for (int r = 0; r < num_samples; ++r)
    out_energies[r] = energy(n, h, J, samples + (size_t)r * n);
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Circuit optimizer: the gate-graph scheduling pass of the runtime.
//
// Consumes a flat gate encoding (opcode, q0, q1, param) and applies
// peephole passes with commutation-aware lookback (gates on disjoint qubits
// commute):
//   * cancel self-inverse pairs (H-H, X-X, Z-Z, CX-CX, CZ-CZ, SWAP-SWAP)
//   * merge consecutive Ry/Rz rotations on the same qubit (sum angles,
//     dropping merged rotations with |angle| < eps)
// Writes a keep-mask and updated params; the Python side rebuilds the gate
// list.  Opcodes: 0=h 1=x 2=z 3=ry 4=rz 5=cx 6=cz 7=swap 8=other(barrier
// to all passes -- ucry/diag/unitary are treated as opaque).

namespace {

inline bool shares_qubit(int a0, int a1, int b0, int b1) {
  if (a0 == b0 || a0 == b1) return true;
  if (a1 >= 0 && (a1 == b0 || a1 == b1)) return true;
  return false;
}

}  // namespace

extern "C" {

// Returns the number of kept gates.  keep[g] in {0,1}; params may be
// updated in place (merged rotation angles).
int qkan_optimize_circuit(int num_gates, const int* ops, const int* q0,
                          const int* q1, double* params, double eps,
                          uint8_t* keep) {
  for (int g = 0; g < num_gates; ++g) keep[g] = 1;

  auto is_self_inverse = [](int op) {
    return op <= 2 || (op >= 5 && op <= 7);
  };
  auto same_qubits = [&](int a, int b) {
    if (q0[a] != q0[b]) {
      // swap/cz are symmetric in their qubits
      bool sym = (ops[a] == 6 || ops[a] == 7);
      if (!(sym && q0[a] == q1[b] && q1[a] == q0[b])) return false;
      return true;
    }
    return q1[a] == q1[b];
  };

  bool changed = true;
  while (changed) {
    changed = false;
    for (int g = 0; g < num_gates; ++g) {
      if (!keep[g]) continue;
      if (ops[g] == 8) continue;  // opaque
      // look forward past commuting gates for a partner
      for (int h = g + 1; h < num_gates; ++h) {
        if (!keep[h]) continue;
        if (ops[h] == 8) {
          // opaque gate: assume it touches everything; stop the scan
          break;
        }
        bool touches = shares_qubit(q0[g], q1[g], q0[h], q1[h]);
        if (!touches) continue;  // commutes (disjoint qubits): scan past
        // first gate sharing a qubit: only a mergeable/cancelable partner
        // with the SAME op + qubits helps; otherwise blocked.
        if (ops[h] == ops[g] && same_qubits(g, h)) {
          if (is_self_inverse(ops[g])) {
            keep[g] = keep[h] = 0;
            changed = true;
          } else if (ops[g] == 3 || ops[g] == 4) {  // ry/rz merge
            params[h] += params[g];
            keep[g] = 0;
            if (std::fabs(params[h]) < eps) keep[h] = 0;
            changed = true;
          }
        }
        break;  // blocked (or handled); stop scanning for g
      }
    }
  }
  int kept = 0;
  for (int g = 0; g < num_gates; ++g) kept += keep[g];
  return kept;
}

// Circuit depth over the kept gates (1-2 qubit gates; op 8 uses both slots
// when q1 >= 0).
int qkan_circuit_depth(int num_gates, const int* q0, const int* q1,
                       const uint8_t* keep, int num_qubits) {
  std::vector<int> level(num_qubits, 0);
  int depth = 0;
  for (int g = 0; g < num_gates; ++g) {
    if (!keep[g]) continue;
    int d = level[q0[g]];
    if (q1[g] >= 0 && level[q1[g]] > d) d = level[q1[g]];
    d += 1;
    level[q0[g]] = d;
    if (q1[g] >= 0) level[q1[g]] = d;
    if (d > depth) depth = d;
  }
  return depth;
}

}  // extern "C"
