// Native SMILES parser + GGNN featurizer.
//
// C++ implementation of the framework's chemistry layer
// (gcnbmp_tpu/chem/smiles.py is the executable spec; both are tested
// for exact agreement).  Replaces the reference pipeline's CPU-bound
// per-row RDKit parsing loop (reference: parsers.py:219-235) for the
// data-loading hot path: organic-subset + bracket atoms, ring closures
// (incl. %nn), branches, dots, Hueckel aromaticity perception for
// kekulized input, implicit-hydrogen completion.
//
// C API (ctypes-friendly): parse a batch of SMILES (optionally
// multi-threaded) into flat arrays; see smiles_parse_batch below.
//
// Build: make -C native   (g++ -O3 -shared -fPIC)

#include <algorithm>
#include <cctype>
#include <cstdint>
#include <cstring>
#include <cmath>
#include <map>
#include <set>
#include <string>
#include <thread>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// data model
// ---------------------------------------------------------------------------

enum BondOrder { SINGLE = 0, DOUBLE = 1, TRIPLE = 2, AROMATIC = 3 };

struct Atom {
  int atomic_num = 0;
  bool aromatic = false;
  int charge = 0;
  int isotope = 0;
  int explicit_h = -1;  // -1 = not a bracket atom (implicit H computed)
  int implicit_h = 0;
  std::string symbol;
};

struct Bond {
  int a1, a2;
  int order;  // BondOrder
};

struct Mol {
  std::vector<Atom> atoms;
  std::vector<Bond> bonds;
  std::vector<std::vector<std::pair<int, int>>> neighbors;  // (atom, bond)

  void build_neighbors() {
    neighbors.assign(atoms.size(), {});
    for (size_t bi = 0; bi < bonds.size(); ++bi) {
      neighbors[bonds[bi].a1].push_back({bonds[bi].a2, (int)bi});
      neighbors[bonds[bi].a2].push_back({bonds[bi].a1, (int)bi});
    }
  }
};

const char* kSymbols[] = {
    "H","He","Li","Be","B","C","N","O","F","Ne","Na","Mg","Al","Si","P","S",
    "Cl","Ar","K","Ca","Sc","Ti","V","Cr","Mn","Fe","Co","Ni","Cu","Zn","Ga",
    "Ge","As","Se","Br","Kr","Rb","Sr","Y","Zr","Nb","Mo","Tc","Ru","Rh","Pd",
    "Ag","Cd","In","Sn","Sb","Te","I","Xe","Cs","Ba","La","Ce","Pr","Nd","Pm",
    "Sm","Eu","Gd","Tb","Dy","Ho","Er","Tm","Yb","Lu","Hf","Ta","W","Re","Os",
    "Ir","Pt","Au","Hg","Tl","Pb","Bi","Po","At","Rn","Fr","Ra","Ac","Th","Pa",
    "U","Np","Pu","Am","Cm","Bk","Cf","Es","Fm","Md","No","Lr","Rf","Db","Sg",
    "Bh","Hs","Mt","Ds","Rg","Cn","Nh","Fl","Mc","Lv","Ts","Og"};

int atomic_number(const std::string& sym) {
  static std::map<std::string, int> table = [] {
    std::map<std::string, int> t;
    for (int i = 0; i < 118; ++i) t[kSymbols[i]] = i + 1;
    return t;
  }();
  auto it = table.find(sym);
  return it == table.end() ? -1 : it->second;
}

// default valences (smallest-fit), mirrors chem/mol.py DEFAULT_VALENCES
bool default_valences(const std::string& sym, std::vector<int>* out) {
  if (sym == "B") *out = {3};
  else if (sym == "C") *out = {4};
  else if (sym == "N") *out = {3, 5};
  else if (sym == "O") *out = {2};
  else if (sym == "P") *out = {3, 5};
  else if (sym == "S") *out = {2, 4, 6};
  else if (sym == "F") *out = {1};
  else if (sym == "Cl" || sym == "Br" || sym == "I") *out = {1, 3, 5, 7};
  else return false;
  return true;
}

double order_value(int order) {
  switch (order) {
    case SINGLE: return 1.0;
    case DOUBLE: return 2.0;
    case TRIPLE: return 3.0;
    default: return 1.5;
  }
}

// ---------------------------------------------------------------------------
// parser
// ---------------------------------------------------------------------------

bool is_organic_upper(const std::string& s) {
  return s == "B" || s == "C" || s == "N" || s == "O" || s == "P" ||
         s == "S" || s == "F" || s == "Cl" || s == "Br" || s == "I";
}

struct Parser {
  const std::string& s;
  size_t i = 0;
  Mol mol;
  int prev = -1;
  std::vector<int> stack;
  std::map<int, std::pair<int, int>> rings;  // num -> (atom, bond or -1)
  int pending = -1;
  bool ok = true;

  explicit Parser(const std::string& str) : s(str) {}

  void fail() { ok = false; }

  void add_atom(Atom a) {
    int idx = (int)mol.atoms.size();
    mol.atoms.push_back(std::move(a));
    if (prev >= 0) {
      int order = pending;
      if (order < 0)
        order = (mol.atoms[prev].aromatic && mol.atoms[idx].aromatic)
                    ? AROMATIC : SINGLE;
      mol.bonds.push_back({prev, idx, order});
    }
    prev = idx;
    pending = -1;
  }

  void close_ring(int num) {
    if (prev < 0) { fail(); return; }
    auto it = rings.find(num);
    if (it == rings.end()) {
      rings[num] = {prev, pending};
      pending = -1;
      return;
    }
    int other = it->second.first;
    int obond = it->second.second;
    rings.erase(it);
    int order = pending >= 0 ? pending : obond;
    if (order < 0)
      order = (mol.atoms[other].aromatic && mol.atoms[prev].aromatic)
                  ? AROMATIC : SINGLE;
    if (other == prev) { fail(); return; }
    mol.bonds.push_back({other, prev, order});
    pending = -1;
  }

  bool bracket_atom() {
    size_t end = s.find(']', i);
    if (end == std::string::npos) { fail(); return false; }
    std::string body = s.substr(i + 1, end - i - 1);
    size_t j = 0;
    Atom a;
    while (j < body.size() && isdigit(body[j]))
      a.isotope = a.isotope * 10 + (body[j++] - '0');
    if (j >= body.size()) { fail(); return false; }
    if (body[j] == '*') {
      a.symbol = "*"; a.atomic_num = 0; ++j;
    } else {
      std::string two = body.substr(j, 2);
      std::string low2 = two;
      if (two.size() == 2 && isupper(two[0]) && islower(two[1]) &&
          atomic_number(two) > 0) {
        a.symbol = two; j += 2;
      } else if (two == "se" || two == "as" || two == "te" || two == "si") {
        a.symbol = two; a.symbol[0] = toupper(a.symbol[0]);
        a.aromatic = true; j += 2;
      } else if (isupper(body[j])) {
        a.symbol = body.substr(j, 1); j += 1;
      } else if (islower(body[j])) {
        a.symbol = std::string(1, toupper(body[j])); a.aromatic = true; j += 1;
      } else { fail(); return false; }
      a.atomic_num = atomic_number(a.symbol);
      if (a.atomic_num < 0) { fail(); return false; }
    }
    while (j < body.size() && body[j] == '@') {
      ++j;
      std::string tag = body.substr(j, 2);
      if (tag == "TH" || tag == "AL" || tag == "SP" || tag == "TB" ||
          tag == "OH") {
        j += 2;
        while (j < body.size() && isdigit(body[j])) ++j;
      }
    }
    a.explicit_h = 0;
    if (j < body.size() && body[j] == 'H') {
      ++j;
      a.explicit_h = 1;
      if (j < body.size() && isdigit(body[j])) {
        a.explicit_h = 0;
        while (j < body.size() && isdigit(body[j]))
          a.explicit_h = a.explicit_h * 10 + (body[j++] - '0');
      }
    }
    if (j < body.size() && (body[j] == '+' || body[j] == '-')) {
      int sign = body[j] == '+' ? 1 : -1;
      char c = body[j];
      ++j;
      if (j < body.size() && isdigit(body[j])) {
        int mag = 0;
        while (j < body.size() && isdigit(body[j]))
          mag = mag * 10 + (body[j++] - '0');
        a.charge = sign * mag;
      } else {
        int mag = 1;
        while (j < body.size() && body[j] == c) { ++mag; ++j; }
        a.charge = sign * mag;
      }
    }
    if (j < body.size() && body[j] == ':') {
      ++j;
      while (j < body.size() && isdigit(body[j])) ++j;
    }
    if (j != body.size()) { fail(); return false; }
    add_atom(std::move(a));
    i = end + 1;
    return true;
  }

  bool run() {
    while (i < s.size() && ok) {
      char c = s[i];
      if (c == '[') {
        if (!bracket_atom()) return false;
      } else if (c == '(') {
        stack.push_back(prev); ++i;
      } else if (c == ')') {
        if (stack.empty()) { fail(); return false; }
        prev = stack.back(); stack.pop_back(); ++i;
      } else if (c == '.') {
        prev = -1; pending = -1; ++i;
      } else if (c == '-') { pending = SINGLE; ++i; }
      else if (c == '=') { pending = DOUBLE; ++i; }
      else if (c == '#') { pending = TRIPLE; ++i; }
      else if (c == ':') { pending = AROMATIC; ++i; }
      else if (c == '/' || c == '\\') { pending = SINGLE; ++i; }
      else if (c == '%') {
        if (i + 2 < s.size() && s[i + 1] == '(') {
          size_t j = s.find(')', i);
          if (j == std::string::npos) { fail(); return false; }
          std::string num = s.substr(i + 2, j - i - 2);
          if (num.empty() || num.size() > 8 ||
              !std::all_of(num.begin(), num.end(),
                           [](unsigned char ch) { return isdigit(ch); })) {
            fail(); return false;  // non-numeric %() ring id: bad row,
                                   // never an exception out of extern-C
          }
          close_ring(std::stoi(num));
          i = j + 1;
        } else if (i + 2 < s.size() && isdigit(s[i + 1]) && isdigit(s[i + 2])) {
          close_ring((s[i + 1] - '0') * 10 + (s[i + 2] - '0'));
          i += 3;
        } else { fail(); return false; }
      } else if (isdigit(c)) {
        close_ring(c - '0'); ++i;
      } else if (isupper(c)) {
        std::string two = s.substr(i, 2);
        Atom a;
        if (two == "Cl" || two == "Br") { a.symbol = two; i += 2; }
        else if (is_organic_upper(std::string(1, c))) {
          a.symbol = std::string(1, c); i += 1;
        } else { fail(); return false; }
        a.atomic_num = atomic_number(a.symbol);
        add_atom(std::move(a));
      } else if (c == 'b' || c == 'c' || c == 'n' || c == 'o' || c == 'p' ||
                 c == 's') {
        Atom a;
        a.symbol = std::string(1, toupper(c));
        a.aromatic = true;
        a.atomic_num = atomic_number(a.symbol);
        add_atom(std::move(a));
        ++i;
      } else if (c == '*') {
        Atom a; a.symbol = "*"; a.atomic_num = 0;
        add_atom(std::move(a)); ++i;
      } else if (c == ' ' || c == '\t') {
        break;  // trailing title
      } else { fail(); return false; }
    }
    if (!ok || !rings.empty() || !stack.empty() || mol.atoms.empty())
      return false;
    return true;
  }
};

// ---------------------------------------------------------------------------
// aromaticity perception + implicit H (mirrors chem/smiles.py)
// ---------------------------------------------------------------------------

bool aromatic_capable(const std::string& sym) {
  return sym == "C" || sym == "N" || sym == "O" || sym == "S" || sym == "P" ||
         sym == "B" || sym == "Se" || sym == "As" || sym == "Si" ||
         sym == "Te";
}

void finalize_implicit_h(Mol& mol) {
  mol.build_neighbors();
  for (size_t i = 0; i < mol.atoms.size(); ++i) {
    Atom& a = mol.atoms[i];
    if (a.explicit_h >= 0) { a.implicit_h = a.explicit_h; continue; }
    std::vector<int> vals;
    if (!default_valences(a.symbol, &vals) || a.charge != 0) {
      a.implicit_h = 0;
      continue;
    }
    double sum = 0;
    for (auto& [nb, bi] : mol.neighbors[i]) sum += order_value(mol.bonds[bi].order);
    int ev = (int)std::ceil(sum - 1e-9);
    a.implicit_h = 0;
    for (int v : vals)
      if (ev <= v) { a.implicit_h = v - ev; break; }
  }
}

// If the bond set forms exactly one simple cycle, return its vertices in
// walk order (mirrors chem/mol.py Mol._bond_set_cycle); else empty.
std::vector<int> bond_set_cycle(const Mol& mol, const std::set<int>& bond_ids) {
  std::map<int, std::vector<std::pair<int, int>>> deg;  // v -> [(w, bi)]
  for (int bi : bond_ids) {
    const Bond& b = mol.bonds[bi];
    deg[b.a1].push_back({b.a2, bi});
    deg[b.a2].push_back({b.a1, bi});
  }
  for (auto& [v, nb] : deg)
    if (nb.size() != 2) return {};
  if (deg.size() != bond_ids.size()) return {};
  int start = deg.begin()->first;  // smallest vertex (std::map is ordered)
  std::vector<int> cyc = {start};
  int prev_bi = -1, u = start;
  for (size_t step = 0; step < bond_ids.size(); ++step) {
    int w = -1, bi = -1;
    for (auto& [ww, bbi] : deg[u])
      if (bbi != prev_bi) { w = ww; bi = bbi; break; }
    if (w < 0) return {};
    prev_bi = bi;
    if (w == start)
      return cyc.size() == bond_ids.size() ? cyc : std::vector<int>{};
    cyc.push_back(w);
    u = w;
  }
  return {};
}

// DFS cycle basis augmented with pairwise XOR combinations — recovers the
// small rings of fused systems the raw basis can miss (mirrors
// chem/mol.py ring_info exactly).
std::vector<std::vector<int>> ring_info(Mol& mol) {
  mol.build_neighbors();
  int n = (int)mol.atoms.size();
  std::vector<bool> seen(n, false);
  std::vector<int> parent(n, -1), parent_bond(n, -1), depth(n, 0);
  std::vector<std::set<int>> cycles_bonds;
  std::vector<bool> used_bond(mol.bonds.size(), false);
  for (int root = 0; root < n; ++root) {
    if (seen[root]) continue;
    std::vector<std::tuple<int, int, int>> stack = {{root, -1, -1}};
    std::vector<int> order;
    while (!stack.empty()) {
      auto [v, p, pb] = stack.back();
      stack.pop_back();
      if (seen[v]) continue;
      seen[v] = true;
      parent[v] = p;
      parent_bond[v] = pb;
      depth[v] = p >= 0 ? depth[p] + 1 : 0;
      order.push_back(v);
      for (auto& [w, bi] : mol.neighbors[v])
        if (!seen[w]) stack.push_back({w, v, bi});
    }
    for (int v : order) {
      for (auto& [w, bi] : mol.neighbors[v]) {
        if (bi == parent_bond[v] || bi == parent_bond[w]) continue;
        if (used_bond[bi]) continue;
        if (depth[w] >= depth[v]) continue;
        used_bond[bi] = true;
        std::set<int> bonds = {bi};
        int u = v;
        while (u != w && parent[u] >= 0) {
          bonds.insert(parent_bond[u]);
          u = parent[u];
        }
        if (u == w) cycles_bonds.push_back(bonds);
      }
    }
  }
  // XOR closure over pairs: recover small fused rings
  std::set<std::set<int>> known(cycles_bonds.begin(), cycles_bonds.end());
  std::vector<std::set<int>> current = cycles_bonds;
  for (int pass = 0; pass < 4; ++pass) {
    std::vector<std::set<int>> fresh;
    for (size_t i = 0; i < current.size(); ++i) {
      for (size_t j = i + 1; j < current.size(); ++j) {
        std::set<int> x;
        std::set_symmetric_difference(
            current[i].begin(), current[i].end(), current[j].begin(),
            current[j].end(), std::inserter(x, x.begin()));
        if (x.empty() || x.size() > 7 || known.count(x)) continue;
        if (!bond_set_cycle(mol, x).empty()) {
          known.insert(x);
          fresh.push_back(x);
        }
      }
    }
    if (fresh.empty()) break;
    current.insert(current.end(), fresh.begin(), fresh.end());
  }
  std::vector<std::vector<int>> rings;
  for (auto& bset : current) {
    auto cyc = bond_set_cycle(mol, bset);
    if (!cyc.empty()) rings.push_back(cyc);
  }
  return rings;
}

void perceive_aromaticity(Mol& mol) {
  for (int guard = 0; guard < 8; ++guard) {
    bool changed = false;
    for (auto& ring : ring_info(mol)) {
      if (ring.size() < 5 || ring.size() > 7) continue;
      std::vector<bool> in_ring(mol.atoms.size(), false);
      for (int a : ring) in_ring[a] = true;
      std::vector<int> ring_bonds;
      for (size_t bi = 0; bi < mol.bonds.size(); ++bi)
        if (in_ring[mol.bonds[bi].a1] && in_ring[mol.bonds[bi].a2])
          ring_bonds.push_back((int)bi);
      if (ring_bonds.size() != ring.size()) continue;
      bool all_aromatic = true;
      for (int bi : ring_bonds)
        if (mol.bonds[bi].order != AROMATIC) all_aromatic = false;
      if (all_aromatic) {
        // ':'-spelled input or a prior pass: ensure the ATOMS carry the
        // flag too before skipping the pi count (mirrors chem/smiles.py)
        for (int a : ring) mol.atoms[a].aromatic = true;
        continue;
      }
      int pi = 0;
      bool okring = true;
      for (int a : ring) {
        Atom& atom = mol.atoms[a];
        if (!aromatic_capable(atom.symbol)) { okring = false; break; }
        bool ring_double = false, ring_arom = false, exo_double = false,
             ring_triple = false;
        for (auto& [w, bi] : mol.neighbors[a]) {
          int order = mol.bonds[bi].order;
          if (in_ring[w]) {
            if (order == DOUBLE) ring_double = true;
            if (order == AROMATIC) ring_arom = true;
            if (order == TRIPLE) ring_triple = true;
          } else if (order == DOUBLE || order == TRIPLE) {
            exo_double = true;
          }
        }
        if (ring_triple) { okring = false; break; }
        if (ring_double || ring_arom) pi += 1;
        else if (exo_double) pi += 0;
        else if (atom.symbol == "N" || atom.symbol == "O" ||
                 atom.symbol == "S" || atom.symbol == "P" ||
                 atom.symbol == "Se" || (atom.symbol == "C" && atom.charge < 0))
          pi += 2;
        else { okring = false; break; }
      }
      if (!okring || pi % 4 != 2) continue;
      for (int a : ring) {
        Atom& atom = mol.atoms[a];
        if (atom.explicit_h < 0 && atom.symbol == "N") {
          finalize_implicit_h(mol);
          atom.explicit_h = atom.implicit_h;
        }
        atom.aromatic = true;
      }
      for (int bi : ring_bonds) {
        if (mol.bonds[bi].order != AROMATIC) {
          mol.bonds[bi].order = AROMATIC;
          changed = true;
        }
      }
    }
    if (!changed) break;
  }
}

bool parse_one(const std::string& smiles, Mol* out) {
  Parser p(smiles);
  if (!p.run()) return false;
  *out = std::move(p.mol);
  perceive_aromaticity(*out);
  finalize_implicit_h(*out);
  return true;
}

}  // namespace

// ---------------------------------------------------------------------------
// C API
// ---------------------------------------------------------------------------

extern "C" {

// Result arena for one batch.
struct BatchResult {
  std::vector<int32_t> mol_ok;        // n_mols
  std::vector<int32_t> atom_offsets;  // n_mols + 1
  std::vector<int32_t> bond_offsets;  // n_mols + 1
  std::vector<int32_t> atomic_nums;
  std::vector<int32_t> aromatic;
  std::vector<int32_t> charges;
  std::vector<int32_t> total_h;
  std::vector<int32_t> degrees;
  std::vector<int32_t> bond_a1;
  std::vector<int32_t> bond_a2;
  std::vector<int32_t> bond_order;
};

// Parse n SMILES strings (NUL-separated buffer) with n_threads workers.
// Returns an opaque handle; query with the accessors; free when done.
void* smiles_parse_batch(const char* buffer, const int32_t* offsets,
                         int32_t n, int32_t n_threads) {
  std::vector<Mol> mols(n);
  std::vector<int32_t> ok(n, 0);
  auto work = [&](int start, int step) {
    for (int k = start; k < n; k += step) {
      std::string smi(buffer + offsets[k], offsets[k + 1] - offsets[k]);
      Mol m;
      if (parse_one(smi, &m)) {
        mols[k] = std::move(m);
        ok[k] = 1;
      }
    }
  };
  if (n_threads <= 1) {
    work(0, 1);
  } else {
    std::vector<std::thread> threads;
    for (int t = 0; t < n_threads; ++t) threads.emplace_back(work, t, n_threads);
    for (auto& t : threads) t.join();
  }
  auto* r = new BatchResult();
  r->mol_ok = std::move(ok);
  r->atom_offsets.push_back(0);
  r->bond_offsets.push_back(0);
  for (int k = 0; k < n; ++k) {
    Mol& m = mols[k];
    if (r->mol_ok[k]) {
      m.build_neighbors();
      for (size_t i = 0; i < m.atoms.size(); ++i) {
        const Atom& a = m.atoms[i];
        r->atomic_nums.push_back(a.atomic_num);
        r->aromatic.push_back(a.aromatic ? 1 : 0);
        r->charges.push_back(a.charge);
        r->total_h.push_back(a.implicit_h);
        r->degrees.push_back((int32_t)m.neighbors[i].size());
      }
      for (const Bond& b : m.bonds) {
        r->bond_a1.push_back(b.a1);
        r->bond_a2.push_back(b.a2);
        r->bond_order.push_back(b.order);
      }
    }
    r->atom_offsets.push_back((int32_t)r->atomic_nums.size());
    r->bond_offsets.push_back((int32_t)r->bond_a1.size());
  }
  return r;
}

#define ACCESSOR(name) \
  const int32_t* smiles_batch_##name(void* h) { \
    return static_cast<BatchResult*>(h)->name.data(); \
  }
ACCESSOR(mol_ok)
ACCESSOR(atom_offsets)
ACCESSOR(bond_offsets)
ACCESSOR(atomic_nums)
ACCESSOR(aromatic)
ACCESSOR(charges)
ACCESSOR(total_h)
ACCESSOR(degrees)
ACCESSOR(bond_a1)
ACCESSOR(bond_a2)
ACCESSOR(bond_order)
#undef ACCESSOR

int32_t smiles_batch_n_atoms(void* h) {
  return (int32_t)static_cast<BatchResult*>(h)->atomic_nums.size();
}
int32_t smiles_batch_n_bonds(void* h) {
  return (int32_t)static_cast<BatchResult*>(h)->bond_a1.size();
}

void smiles_batch_free(void* h) { delete static_cast<BatchResult*>(h); }

}  // extern "C"
