#!/usr/bin/env python3
"""Regenerate the five i18n catalogs (facet_tpu/i18n/{en,fr,de,it,es}.json).

Single source of truth for the viewer's translation vocabulary: every key
the client references (data-i18n / data-i18n-ph attributes, t(...) calls,
and the category_names./composition_patterns./sort_options. prefixes) is
declared here with all five translations, then merged over any existing
catalog entries (existing keys not declared here are preserved).

Run: python tools/gen_i18n.py
"""

import json
import os

LANGS = ("en", "fr", "de", "it", "es")
OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "facet_tpu", "i18n")

K = {}


def add(key, en, fr, de, it, es):
    K[key] = dict(zip(LANGS, (en, fr, de, it, es)))


# --------------------------------------------------------------- nav / auth
add("app.title", "Facet", "Facet", "Facet", "Facet", "Facet")
add("nav.gallery", "Gallery", "Galerie", "Galerie", "Galleria", "Galería")
add("nav.stats", "Statistics", "Statistiques", "Statistiken", "Statistiche", "Estadísticas")
add("nav.persons", "People", "Personnes", "Personen", "Persone", "Personas")
add("nav.comparison", "Compare", "Comparer", "Vergleichen", "Confronta", "Comparar")
add("nav.settings", "Settings", "Réglages", "Einstellungen", "Impostazioni", "Ajustes")
add("auth.login", "Log in", "Connexion", "Anmelden", "Accedi", "Iniciar sesión")
add("auth.logout", "Log out", "Déconnexion", "Abmelden", "Esci", "Cerrar sesión")
add("auth.invalid", "Invalid credentials", "Identifiants invalides", "Ungültige Anmeldedaten", "Credenziali non valide", "Credenciales no válidas")
add("auth.username", "Username", "Nom d'utilisateur", "Benutzername", "Nome utente", "Nombre de usuario")
add("auth.password", "Password", "Mot de passe", "Passwort", "Password", "Contraseña")
add("auth.edition", "Edit mode", "Mode édition", "Bearbeitungsmodus", "Modalità modifica", "Modo edición")
add("auth.edition_login", "Unlock editing", "Déverrouiller l'édition", "Bearbeitung freischalten", "Sblocca modifica", "Desbloquear edición")
add("common.cancel", "Cancel", "Annuler", "Abbrechen", "Annulla", "Cancelar")
add("common.close", "Close", "Fermer", "Schließen", "Chiudi", "Cerrar")
add("common.confirm", "Confirm", "Confirmer", "Bestätigen", "Conferma", "Confirmar")
add("common.delete", "Delete", "Supprimer", "Löschen", "Elimina", "Eliminar")
add("common.loading", "Loading", "Chargement", "Laden", "Caricamento", "Cargando")
add("common.save", "Save", "Enregistrer", "Speichern", "Salva", "Guardar")
add("common.error", "Something went wrong", "Une erreur est survenue", "Etwas ist schiefgelaufen", "Qualcosa è andato storto", "Algo salió mal")

# ----------------------------------------------------------------- gallery
add("gallery.search", "Search", "Rechercher", "Suchen", "Cerca", "Buscar")
add("gallery.filter", "Filters", "Filtres", "Filter", "Filtri", "Filtros")
add("gallery.reset_filters", "Reset filters", "Réinitialiser les filtres", "Filter zurücksetzen", "Reimposta filtri", "Restablecer filtros")
add("gallery.score", "Score", "Note", "Bewertung", "Punteggio", "Puntuación")
add("gallery.aesthetic", "Aesthetic", "Esthétique", "Ästhetik", "Estetica", "Estética")
add("gallery.quality", "Quality", "Qualité", "Qualität", "Qualità", "Calidad")
add("gallery.sharpness", "Sharpness", "Netteté", "Schärfe", "Nitidezza", "Nitidez")
add("gallery.exposure", "Exposure", "Exposition", "Belichtung", "Esposizione", "Exposición")
add("gallery.composition", "Composition", "Composition", "Komposition", "Composizione", "Composición")
add("gallery.color", "Color", "Couleur", "Farbe", "Colore", "Color")
add("gallery.contrast", "Contrast", "Contraste", "Kontrast", "Contrasto", "Contraste")
add("gallery.faces", "Faces", "Visages", "Gesichter", "Volti", "Caras")
add("gallery.face_quality", "Face quality", "Qualité des visages", "Gesichtsqualität", "Qualità dei volti", "Calidad de caras")
add("gallery.category", "Category", "Catégorie", "Kategorie", "Categoria", "Categoría")
add("gallery.tags", "Tags", "Étiquettes", "Schlagwörter", "Tag", "Etiquetas")
add("gallery.camera", "Camera", "Appareil", "Kamera", "Fotocamera", "Cámara")
add("gallery.pattern", "Pattern", "Motif", "Muster", "Schema", "Patrón")
add("gallery.similar", "Similar photos", "Photos similaires", "Ähnliche Fotos", "Foto simili", "Fotos similares")
add("gallery.rating", "Rating", "Note perso", "Sternebewertung", "Valutazione", "Valoración")
add("gallery.date", "Date", "Date", "Datum", "Data", "Fecha")
add("gallery.focal", "Focal", "Focale", "Brennweite", "Focale", "Focal")
add("gallery.ascending", "ascending", "croissant", "aufsteigend", "crescente", "ascendente")
add("gallery.monochrome_only", "monochrome only", "monochrome uniquement", "nur Schwarzweiß", "solo monocromo", "solo monocromo")
add("gallery.hide_blinks", "Hide blinks", "Masquer les yeux fermés", "Geschlossene Augen ausblenden", "Nascondi occhi chiusi", "Ocultar ojos cerrados")
add("gallery.hide_bursts", "Hide burst shots", "Masquer les rafales", "Serienbilder ausblenden", "Nascondi le raffiche", "Ocultar ráfagas")
add("gallery.hide_duplicates", "Hide duplicates", "Masquer les doublons", "Duplikate ausblenden", "Nascondi duplicati", "Ocultar duplicados")
add("gallery.hide_rejected", "Hide rejected", "Masquer les rejetées", "Abgelehnte ausblenden", "Nascondi scartate", "Ocultar rechazadas")
add("gallery.favorites", "Favorites", "Favoris", "Favoriten", "Preferiti", "Favoritos")
add("gallery.reject", "reject", "rejeter", "ablehnen", "scarta", "rechazar")
add("gallery.rejected", "rejected", "rejetée", "abgelehnt", "scartata", "rechazada")
add("gallery.loading", "Loading…", "Chargement…", "Laden…", "Caricamento…", "Cargando…")
add("gallery.end", "End of results", "Fin des résultats", "Ende der Ergebnisse", "Fine dei risultati", "Fin de los resultados")
add("gallery.no_results", "No photos match the current filters", "Aucune photo ne correspond aux filtres", "Keine Fotos entsprechen den Filtern", "Nessuna foto corrisponde ai filtri", "Ninguna foto coincide con los filtros")
add("gallery.count", "{shown} of {total} photos", "{shown} sur {total} photos", "{shown} von {total} Fotos", "{shown} di {total} foto", "{shown} de {total} fotos")
add("gallery.sort", "Sort by", "Trier par", "Sortieren nach", "Ordina per", "Ordenar por")

# -------------------------------------------------------- filter dropdowns
add("filter.all_cameras", "All cameras", "Tous les appareils", "Alle Kameras", "Tutte le fotocamere", "Todas las cámaras")
add("filter.all_lenses", "All lenses", "Tous les objectifs", "Alle Objektive", "Tutti gli obiettivi", "Todos los objetivos")
add("filter.all_categories", "All categories", "Toutes les catégories", "Alle Kategorien", "Tutte le categorie", "Todas las categorías")
add("filter.all_tags", "All tags", "Toutes les étiquettes", "Alle Schlagwörter", "Tutti i tag", "Todas las etiquetas")
add("filter.all_people", "All people", "Toutes les personnes", "Alle Personen", "Tutte le persone", "Todas las personas")
add("filter.all_patterns", "All patterns", "Tous les motifs", "Alle Muster", "Tutti gli schemi", "Todos los patrones")

# ------------------------------------------------------------- photo types
_types = {
    "all": ("All", "Toutes", "Alle", "Tutte", "Todas"),
    "top_picks": ("Top picks", "Meilleures", "Top-Auswahl", "Migliori", "Mejores"),
    "portraits": ("Portraits", "Portraits", "Porträts", "Ritratti", "Retratos"),
    "landscapes": ("Landscapes", "Paysages", "Landschaften", "Paesaggi", "Paisajes"),
    "low_light": ("Low light", "Basse lumière", "Schwaches Licht", "Poca luce", "Poca luz"),
    "monochrome": ("Monochrome", "Monochrome", "Schwarzweiß", "Monocromo", "Monocromo"),
    "silhouettes": ("Silhouettes", "Silhouettes", "Silhouetten", "Sagome", "Siluetas"),
    "blinks": ("Blinks", "Yeux fermés", "Geschlossene Augen", "Occhi chiusi", "Ojos cerrados"),
    "bursts": ("Burst shots", "Rafales", "Serienbilder", "Raffiche", "Ráfagas"),
    "duplicates": ("Duplicates", "Doublons", "Duplikate", "Duplicati", "Duplicados"),
    "favorites": ("Favorites", "Favoris", "Favoriten", "Preferiti", "Favoritos"),
    "rejected": ("Rejected", "Rejetées", "Abgelehnt", "Scartate", "Rechazadas"),
    "rated": ("Rated", "Notées", "Bewertet", "Valutate", "Valoradas"),
    "untagged": ("Untagged", "Sans étiquette", "Ohne Schlagwort", "Senza tag", "Sin etiquetas"),
    "group_portraits": ("Group portraits", "Portraits de groupe", "Gruppenporträts", "Ritratti di gruppo", "Retratos de grupo"),
}
for name, words in _types.items():
    add("type." + name, *words)

# ------------------------------------------------------------ quality tiers
add("quality.best", "Best", "Exceptionnelles", "Beste", "Migliori", "Mejores")
add("quality.excellent", "Excellent", "Excellentes", "Hervorragend", "Eccellenti", "Excelentes")
add("quality.great", "Great", "Très bonnes", "Sehr gut", "Ottime", "Muy buenas")
add("quality.good", "Good", "Bonnes", "Gut", "Buone", "Buenas")

# ------------------------------------------------------------------- stats
add("stats.overview", "Overview", "Aperçu", "Überblick", "Panoramica", "Resumen")
add("stats.tab_gear", "Gear", "Matériel", "Ausrüstung", "Attrezzatura", "Equipo")
add("stats.tab_categories", "Categories", "Catégories", "Kategorien", "Categorie", "Categorías")
add("stats.tab_distribution", "Distribution", "Distribution", "Verteilung", "Distribuzione", "Distribución")
add("stats.tab_timeline", "Timeline", "Chronologie", "Zeitverlauf", "Cronologia", "Cronología")
add("stats.tab_correlations", "Correlations", "Corrélations", "Korrelationen", "Correlazioni", "Correlaciones")
add("stats.gear", "Cameras & lenses", "Appareils et objectifs", "Kameras & Objektive", "Fotocamere e obiettivi", "Cámaras y objetivos")
add("stats.settings", "Shooting settings", "Réglages de prise de vue", "Aufnahmeeinstellungen", "Impostazioni di scatto", "Ajustes de disparo")
add("stats.aperture", "Aperture", "Ouverture", "Blende", "Apertura", "Apertura")
add("stats.focal", "Focal length", "Focale", "Brennweite", "Lunghezza focale", "Distancia focal")
add("stats.categories", "Categories", "Catégories", "Kategorien", "Categorie", "Categorías")
add("stats.category_metrics", "Category metrics", "Métriques par catégorie", "Kategorie-Metriken", "Metriche per categoria", "Métricas por categoría")
add("stats.weights", "Category weights", "Poids par catégorie", "Kategorie-Gewichte", "Pesi per categoria", "Pesos por categoría")
add("stats.save_weights", "Save weights", "Enregistrer les poids", "Gewichte speichern", "Salva i pesi", "Guardar pesos")
add("stats.saved", "Saved", "Enregistré", "Gespeichert", "Salvato", "Guardado")
add("stats.distribution", "Score distribution", "Distribution des notes", "Bewertungsverteilung", "Distribuzione dei punteggi", "Distribución de puntuaciones")
add("stats.quality_tiers", "Quality tiers", "Paliers de qualité", "Qualitätsstufen", "Fasce di qualità", "Niveles de calidad")
add("stats.timeline", "Timeline", "Chronologie", "Zeitverlauf", "Cronologia", "Cronología")
add("stats.correlations", "Metric correlations with the aggregate", "Corrélations des métriques avec la note globale", "Korrelationen der Metriken mit der Gesamtnote", "Correlazioni delle metriche con il punteggio totale", "Correlaciones de métricas con la puntuación global")
add("stats.category_overlap", "Category score overlap", "Chevauchement des catégories", "Kategorien-Überschneidung", "Sovrapposizione delle categorie", "Solapamiento de categorías")
add("stats.total_photos", "Photos", "Photos", "Fotos", "Foto", "Fotos")
add("stats.avg_score", "Avg score", "Note moyenne", "Ø Bewertung", "Punteggio medio", "Puntuación media")
add("stats.faces", "Faces", "Visages", "Gesichter", "Volti", "Caras")
add("stats.persons", "People", "Personnes", "Personen", "Persone", "Personas")
add("stats.blinks", "Blinks", "Yeux fermés", "Geschl. Augen", "Occhi chiusi", "Ojos cerrados")
add("stats.camera", "Camera", "Appareil", "Kamera", "Fotocamera", "Cámara")
add("stats.lens", "Lens", "Objectif", "Objektiv", "Obiettivo", "Objetivo")
add("stats.count", "Count", "Nombre", "Anzahl", "Numero", "Cantidad")
add("stats.max_score", "Max score", "Note max", "Max. Bewertung", "Punteggio max", "Puntuación máx")
add("stats.category", "Category", "Catégorie", "Kategorie", "Categoria", "Categoría")
add("stats.month", "Month", "Mois", "Monat", "Mese", "Mes")
add("stats.tier", "Tier", "Palier", "Stufe", "Fascia", "Nivel")
add("stats.metric", "Metric", "Métrique", "Metrik", "Metrica", "Métrica")
add("stats.avg", "Avg", "Moy.", "Ø", "Media", "Media")
add("stats.min", "Min", "Min", "Min", "Min", "Mín")
add("stats.max", "Max", "Max", "Max", "Max", "Máx")
add("stats.global", "Global", "Global", "Global", "Globale", "Global")
add("stats.weight", "Weight", "Poids", "Gewicht", "Peso", "Peso")
add("stats.priority", "Priority", "Priorité", "Priorität", "Priorità", "Prioridad")
add("stats.assigned", "Assigned", "Attribuées", "Zugewiesen", "Assegnate", "Asignadas")
add("stats.matched", "Matched", "Correspondantes", "Passend", "Corrispondenti", "Coincidentes")
add("stats.captured", "Captured by higher priority", "Captées par une priorité supérieure", "Von höherer Priorität erfasst", "Catturate da priorità superiore", "Capturadas por mayor prioridad")
add("stats.overlap_pair", "Overlapping pair", "Paire en chevauchement", "Überschneidendes Paar", "Coppia sovrapposta", "Par solapado")
add("stats.uncategorized", "{n} photos uncategorized", "{n} photos sans catégorie", "{n} Fotos ohne Kategorie", "{n} foto senza categoria", "{n} fotos sin categoría")
add("stats.heatmap", "Shooting heatmap (day × hour)", "Carte thermique des prises (jour × heure)", "Aufnahme-Heatmap (Tag × Stunde)", "Mappa termica degli scatti (giorno × ora)", "Mapa de calor de disparos (día × hora)")
add("stats.top_days", "Most active days", "Jours les plus actifs", "Aktivste Tage", "Giorni più attivi", "Días más activos")
add("stats.scatter", "Correlation scatter", "Nuage de corrélation", "Korrelations-Streudiagramm", "Grafico a dispersione delle correlazioni", "Diagrama de dispersión de correlación")
add("stats.date", "Date", "Date", "Datum", "Data", "Fecha")

# ----------------------------------------------------------------- persons
add("persons.merge_suggestions", "Merge suggestions", "Suggestions de fusion", "Zusammenführungsvorschläge", "Suggerimenti di unione", "Sugerencias de fusión")
add("persons.merge", "Merge", "Fusionner", "Zusammenführen", "Unisci", "Fusionar")
add("persons.merged", "Merged", "Fusionné", "Zusammengeführt", "Unite", "Fusionado")
add("persons.dismiss", "Dismiss", "Ignorer", "Verwerfen", "Ignora", "Descartar")
add("persons.unnamed", "Unnamed", "Sans nom", "Unbenannt", "Senza nome", "Sin nombre")
add("persons.delete", "Delete", "Supprimer", "Löschen", "Elimina", "Eliminar")
add("persons.rename", "Rename", "Renommer", "Umbenennen", "Rinomina", "Renombrar")
add("persons.renamed", "Renamed", "Renommé", "Umbenannt", "Rinominato", "Renombrado")
add("persons.avatar", "Avatar", "Avatar", "Avatar", "Avatar", "Avatar")
add("persons.avatar_set", "Avatar updated", "Avatar mis à jour", "Avatar aktualisiert", "Avatar aggiornato", "Avatar actualizado")
add("persons.photo_count", "{n} photos", "{n} photos", "{n} Fotos", "{n} foto", "{n} fotos")

# -------------------------------------------------------------- comparison
add("comparison.which_better", "Which photo is better?", "Quelle photo est la meilleure ?", "Welches Foto ist besser?", "Quale foto è migliore?", "¿Qué foto es mejor?")
add("comparison.keys_hint", "Keys: ← left wins · → right wins · t tie · s skip", "Touches : ← gauche gagne · → droite gagne · t égalité · s passer", "Tasten: ← links gewinnt · → rechts gewinnt · t unentschieden · s überspringen", "Tasti: ← vince sinistra · → vince destra · t pareggio · s salta", "Teclas: ← gana izquierda · → gana derecha · t empate · s saltar")
add("comparison.pick_left", "This one (←)", "Celle-ci (←)", "Dieses (←)", "Questa (←)", "Esta (←)")
add("comparison.pick_right", "This one (→)", "Celle-ci (→)", "Dieses (→)", "Questa (→)", "Esta (→)")
add("comparison.tie", "Tie", "Égalité", "Unentschieden", "Pareggio", "Empate")
add("comparison.skip", "Skip", "Passer", "Überspringen", "Salta", "Saltar")
add("comparison.submitted", "Vote recorded", "Vote enregistré", "Stimme gespeichert", "Voto registrato", "Voto registrado")
add("comparison.no_pairs", "No more pairs to compare", "Plus de paires à comparer", "Keine weiteren Paare", "Nessun'altra coppia", "No hay más pares")
add("comparison.statistics", "Voting statistics", "Statistiques des votes", "Abstimmungsstatistik", "Statistiche dei voti", "Estadísticas de votos")
add("comparison.total_votes", "Total votes", "Votes au total", "Stimmen insgesamt", "Voti totali", "Votos totales")
add("comparison.ties", "Ties", "Égalités", "Unentschieden", "Pareggi", "Empates")
add("comparison.skips", "Skips", "Passées", "Übersprungen", "Saltate", "Saltados")
add("comparison.agreement", "Agreement with scores", "Accord avec les notes", "Übereinstimmung mit Bewertungen", "Accordo con i punteggi", "Acuerdo con las puntuaciones")
add("comparison.coverage", "Coverage", "Couverture", "Abdeckung", "Copertura", "Cobertura")
add("comparison.accuracy_gain", "Accuracy {before}% → {after}%", "Précision {before}% → {after}%", "Genauigkeit {before}% → {after}%", "Accuratezza {before}% → {after}%", "Precisión {before}% → {after}%")
add("comparison.current", "Current", "Actuel", "Aktuell", "Attuale", "Actual")
add("comparison.suggested", "Suggested", "Suggéré", "Vorgeschlagen", "Suggerito", "Sugerido")
add("comparison.optimize", "Learn weights from votes", "Apprendre les poids depuis les votes", "Gewichte aus Stimmen lernen", "Apprendi i pesi dai voti", "Aprender pesos de los votos")
add("comparison.optimized", "Weights learned", "Poids appris", "Gewichte gelernt", "Pesi appresi", "Pesos aprendidos")
add("comparison.apply", "Apply learned weights", "Appliquer les poids appris", "Gelernte Gewichte anwenden", "Applica i pesi appresi", "Aplicar pesos aprendidos")
add("comparison.applied", "Weights applied", "Poids appliqués", "Gewichte angewendet", "Pesi applicati", "Pesos aplicados")
add("comparison.snapshots", "Weight snapshots", "Instantanés des poids", "Gewichts-Schnappschüsse", "Istantanee dei pesi", "Instantáneas de pesos")
add("comparison.restore", "Restore", "Restaurer", "Wiederherstellen", "Ripristina", "Restaurar")
add("comparison.restored", "Snapshot restored", "Instantané restauré", "Schnappschuss wiederhergestellt", "Istantanea ripristinata", "Instantánea restaurada")

# --------------------------------------------------- scoring category names
_cats = {
    "art": ("Art", "Art", "Kunst", "Arte", "Arte"),
    "astro": ("Astrophotography", "Astrophotographie", "Astrofotografie", "Astrofotografia", "Astrofotografía"),
    "concert": ("Concert", "Concert", "Konzert", "Concerto", "Concierto"),
    "street": ("Street", "Rue", "Straße", "Street", "Calle"),
    "group_portrait": ("Group portrait", "Portrait de groupe", "Gruppenporträt", "Ritratto di gruppo", "Retrato de grupo"),
    "silhouette": ("Silhouette", "Silhouette", "Silhouette", "Sagoma", "Silueta"),
    "portrait": ("Portrait", "Portrait", "Porträt", "Ritratto", "Retrato"),
    "portrait_bw": ("B&W portrait", "Portrait N&B", "SW-Porträt", "Ritratto B/N", "Retrato B/N"),
    "human_others": ("People (other)", "Personnes (autres)", "Menschen (sonstige)", "Persone (altro)", "Personas (otros)"),
    "macro": ("Macro", "Macro", "Makro", "Macro", "Macro"),
    "aerial": ("Aerial", "Aérien", "Luftaufnahme", "Aerea", "Aérea"),
    "wildlife": ("Wildlife", "Faune", "Wildtiere", "Fauna selvatica", "Fauna"),
    "food": ("Food", "Cuisine", "Essen", "Cibo", "Comida"),
    "sports": ("Sports", "Sport", "Sport", "Sport", "Deportes"),
    "vehicle": ("Vehicles", "Véhicules", "Fahrzeuge", "Veicoli", "Vehículos"),
    "travel": ("Travel", "Voyage", "Reise", "Viaggio", "Viajes"),
    "fashion": ("Fashion", "Mode", "Mode", "Moda", "Moda"),
    "architecture": ("Architecture", "Architecture", "Architektur", "Architettura", "Arquitectura"),
    "urban": ("Urban", "Urbain", "Urban", "Urbano", "Urbano"),
    "long_exposure": ("Long exposure", "Pose longue", "Langzeitbelichtung", "Lunga esposizione", "Larga exposición"),
    "cinematic": ("Cinematic", "Cinématique", "Filmisch", "Cinematografico", "Cinemático"),
    "vintage": ("Vintage", "Vintage", "Vintage", "Vintage", "Vintage"),
    "abstract": ("Abstract", "Abstrait", "Abstrakt", "Astratto", "Abstracto"),
    "night": ("Night", "Nuit", "Nacht", "Notte", "Noche"),
    "minimalist": ("Minimalist", "Minimaliste", "Minimalistisch", "Minimalista", "Minimalista"),
    "dramatic": ("Dramatic", "Dramatique", "Dramatisch", "Drammatico", "Dramático"),
    "monochrome": ("Monochrome", "Monochrome", "Schwarzweiß", "Monocromo", "Monocromo"),
    "weather": ("Weather", "Météo", "Wetter", "Meteo", "Clima"),
    "landscape": ("Landscape", "Paysage", "Landschaft", "Paesaggio", "Paisaje"),
    "default": ("General", "Général", "Allgemein", "Generale", "General"),
}
for name, words in _cats.items():
    add("category_names." + name, *words)

# ---------------------------------------------------- composition patterns
_patterns = {
    "global": ("Global balance", "Équilibre global", "Globale Balance", "Equilibrio globale", "Equilibrio global"),
    "horizontal": ("Horizontal", "Horizontal", "Horizontal", "Orizzontale", "Horizontal"),
    "vertical": ("Vertical", "Vertical", "Vertikal", "Verticale", "Vertical"),
    "triangular": ("Triangular", "Triangulaire", "Dreieckig", "Triangolare", "Triangular"),
    "surround": ("Surround", "Encadrement", "Umrahmung", "Cornice", "Enmarcado"),
    "quarter": ("Quarter", "Quart", "Viertel", "Quarto", "Cuarto"),
    "cross": ("Cross", "Croix", "Kreuz", "Croce", "Cruz"),
    "rule_of_thirds": ("Rule of thirds", "Règle des tiers", "Drittel-Regel", "Regola dei terzi", "Regla de los tercios"),
}
for name, words in _patterns.items():
    add("composition_patterns." + name, *words)

# ------------------------------------------------ sort columns / dimensions
_sorts = {
    "aggregate": ("Score", "Note", "Bewertung", "Punteggio", "Puntuación"),
    "aesthetic": ("Aesthetic", "Esthétique", "Ästhetik", "Estetica", "Estética"),
    "quality_score": ("Quality", "Qualité", "Qualität", "Qualità", "Calidad"),
    "quality": ("Quality", "Qualité", "Qualität", "Qualità", "Calidad"),
    "topiq_score": ("TOPIQ quality", "Qualité TOPIQ", "TOPIQ-Qualität", "Qualità TOPIQ", "Calidad TOPIQ"),
    "comp_score": ("Composition", "Composition", "Komposition", "Composizione", "Composición"),
    "composition": ("Composition", "Composition", "Komposition", "Composizione", "Composición"),
    "face_quality": ("Face quality", "Qualité des visages", "Gesichtsqualität", "Qualità dei volti", "Calidad de caras"),
    "eye_sharpness": ("Eye sharpness", "Netteté des yeux", "Augenschärfe", "Nitidezza degli occhi", "Nitidez de ojos"),
    "face_sharpness": ("Face sharpness", "Netteté des visages", "Gesichtsschärfe", "Nitidezza dei volti", "Nitidez de caras"),
    "tech_sharpness": ("Sharpness", "Netteté", "Schärfe", "Nitidezza", "Nitidez"),
    "exposure_score": ("Exposure", "Exposition", "Belichtung", "Esposizione", "Exposición"),
    "exposure": ("Exposure", "Exposition", "Belichtung", "Esposizione", "Exposición"),
    "color_score": ("Color", "Couleur", "Farbe", "Colore", "Color"),
    "color": ("Color", "Couleur", "Farbe", "Colore", "Color"),
    "contrast_score": ("Contrast", "Contraste", "Kontrast", "Contrasto", "Contraste"),
    "contrast": ("Contrast", "Contraste", "Kontrast", "Contrasto", "Contraste"),
    "dynamic_range_stops": ("Dynamic range", "Plage dynamique", "Dynamikumfang", "Gamma dinamica", "Rango dinámico"),
    "dynamic_range": ("Dynamic range", "Plage dynamique", "Dynamikumfang", "Gamma dinamica", "Rango dinámico"),
    "noise_sigma": ("Noise", "Bruit", "Rauschen", "Rumore", "Ruido"),
    "power_point_score": ("Power points", "Points forts", "Kraftpunkte", "Punti di forza", "Puntos fuertes"),
    "leading_lines_score": ("Leading lines", "Lignes directrices", "Führungslinien", "Linee guida", "Líneas guía"),
    "leading_lines": ("Leading lines", "Lignes directrices", "Führungslinien", "Linee guida", "Líneas guía"),
    "isolation": ("Subject isolation", "Isolation du sujet", "Motivfreistellung", "Isolamento del soggetto", "Aislamiento del sujeto"),
    "date_taken": ("Date taken", "Date de prise", "Aufnahmedatum", "Data di scatto", "Fecha de captura"),
    "iso": ("ISO", "ISO", "ISO", "ISO", "ISO"),
    "f_stop": ("Aperture", "Ouverture", "Blende", "Apertura", "Apertura"),
    "focal_length": ("Focal length", "Focale", "Brennweite", "Lunghezza focale", "Distancia focal"),
    "face_count": ("Face count", "Nombre de visages", "Gesichteranzahl", "Numero di volti", "Número de caras"),
    "face_ratio": ("Face ratio", "Proportion de visage", "Gesichtsanteil", "Rapporto volto", "Proporción de cara"),
    "star_rating": ("Star rating", "Note perso", "Sternebewertung", "Valutazione", "Valoración"),
    "filename": ("Filename", "Nom de fichier", "Dateiname", "Nome file", "Nombre de archivo"),
    "category": ("Category", "Catégorie", "Kategorie", "Categoria", "Categoría"),
    "mean_luminance": ("Luminance", "Luminance", "Luminanz", "Luminanza", "Luminancia"),
}
for name, words in _sorts.items():
    add("sort_options." + name, *words)

_groups = {
    "scores": ("Scores", "Notes", "Bewertungen", "Punteggi", "Puntuaciones"),
    "technical": ("Technical", "Technique", "Technisch", "Tecnica", "Técnica"),
    "composition": ("Composition", "Composition", "Komposition", "Composizione", "Composición"),
    "exif": ("EXIF", "EXIF", "EXIF", "EXIF", "EXIF"),
    "faces": ("Faces", "Visages", "Gesichter", "Volti", "Caras"),
    "user": ("Your ratings", "Vos notes", "Ihre Bewertungen", "Le tue valutazioni", "Tus valoraciones"),
    "other": ("Other", "Autres", "Sonstige", "Altro", "Otros"),
}
for name, words in _groups.items():
    add("sort_groups." + name, *words)

# --------------------------------------------------- tooltips (metric help)
_tips = {
    "aggregate": ("Weighted total of all metrics for the photo's category", "Total pondéré de toutes les métriques pour la catégorie de la photo", "Gewichtete Summe aller Metriken für die Kategorie des Fotos", "Totale ponderato di tutte le metriche per la categoria della foto", "Total ponderado de todas las métricas para la categoría de la foto"),
    "aesthetic": ("CLIP-based aesthetic prediction", "Prédiction esthétique basée sur CLIP", "CLIP-basierte Ästhetik-Vorhersage", "Previsione estetica basata su CLIP", "Predicción estética basada en CLIP"),
    "quality": ("No-reference image quality (TOPIQ ensemble)", "Qualité d'image sans référence (ensemble TOPIQ)", "Referenzfreie Bildqualität (TOPIQ-Ensemble)", "Qualità dell'immagine senza riferimento (ensemble TOPIQ)", "Calidad de imagen sin referencia (conjunto TOPIQ)"),
    "sharpness": ("Laplacian variance of the luminance", "Variance du laplacien de la luminance", "Laplace-Varianz der Luminanz", "Varianza del laplaciano della luminanza", "Varianza del laplaciano de la luminancia"),
    "exposure": ("Histogram balance, clipping and bimodality", "Équilibre de l'histogramme, écrêtage et bimodalité", "Histogramm-Balance, Clipping und Bimodalität", "Equilibrio dell'istogramma, clipping e bimodalità", "Equilibrio del histograma, recorte y bimodalidad"),
    "composition": ("SAMP-Net composition analysis", "Analyse de composition SAMP-Net", "SAMP-Net-Kompositionsanalyse", "Analisi della composizione SAMP-Net", "Análisis de composición SAMP-Net"),
    "color": ("Hue–saturation entropy and saturation balance", "Entropie teinte–saturation et équilibre de saturation", "Farbton-Sättigungs-Entropie und Sättigungsbalance", "Entropia tonalità–saturazione ed equilibrio della saturazione", "Entropía tono–saturación y equilibrio de saturación"),
    "contrast": ("Percentile and RMS contrast", "Contraste par percentiles et RMS", "Perzentil- und RMS-Kontrast", "Contrasto percentile e RMS", "Contraste por percentiles y RMS"),
    "faces": ("Detected face quality, sharpness and eyes", "Qualité des visages détectés, netteté et yeux", "Qualität erkannter Gesichter, Schärfe und Augen", "Qualità dei volti rilevati, nitidezza e occhi", "Calidad de caras detectadas, nitidez y ojos"),
}
for name, words in _tips.items():
    add("tooltip." + name, *words)

# ---------------------------------------------------------- notifications
add("notifications.saved", "Saved", "Enregistré", "Gespeichert", "Salvato", "Guardado")
add("notifications.deleted", "Deleted", "Supprimé", "Gelöscht", "Eliminato", "Eliminado")
add("notifications.failed", "Action failed", "Échec de l'action", "Aktion fehlgeschlagen", "Azione non riuscita", "La acción falló")
add("errors.network", "Network error", "Erreur réseau", "Netzwerkfehler", "Errore di rete", "Error de red")
add("errors.forbidden", "Not allowed for your role", "Interdit pour votre rôle", "Für Ihre Rolle nicht erlaubt", "Non consentito per il tuo ruolo", "No permitido para tu rol")
add("errors.not_found", "Not found", "Introuvable", "Nicht gefunden", "Non trovato", "No encontrado")
add("language.en", "English", "Anglais", "Englisch", "Inglese", "Inglés")
add("language.fr", "French", "Français", "Französisch", "Francese", "Francés")
add("language.de", "German", "Allemand", "Deutsch", "Tedesco", "Alemán")
add("language.it", "Italian", "Italien", "Italienisch", "Italiano", "Italiano")
add("language.es", "Spanish", "Espagnol", "Spanisch", "Spagnolo", "Español")




# ------------------------------------------------ round-3 viewer depth
add('gallery.select',
    'Select', 'Sélectionner', 'Auswählen', 'Seleziona', 'Seleccionar')
add('gallery.selection.favorite',
    'Favorite selected', 'Ajouter la sélection aux favoris', 'Auswahl favorisieren', 'Aggiungi selezione ai preferiti', 'Añadir selección a favoritos')
add('gallery.selection.favorited',
    'Added {n} photos to favorites', '{n} photos ajoutées aux favoris', '{n} Fotos zu Favoriten hinzugefügt', '{n} foto aggiunte ai preferiti', '{n} fotos añadidas a favoritos')
add('gallery.faces_in_photo',
    '{n} faces in this photo', '{n} visages sur cette photo', '{n} Gesichter auf diesem Foto', '{n} volti in questa foto', '{n} caras en esta foto')
add('gallery.face_n',
    'Face {n}', 'Visage {n}', 'Gesicht {n}', 'Volto {n}', 'Cara {n}')
add('gallery.assign_all_faces',
    'Assign all {n} unidentified faces to', 'Attribuer les {n} visages non identifiés à', 'Alle {n} unbekannten Gesichter zuordnen zu', 'Assegna tutti i {n} volti non identificati a', 'Asignar las {n} caras sin identificar a')
add('notifications.person_removed',
    'Person removed from the photo', 'Personne retirée de la photo', 'Person vom Foto entfernt', 'Persona rimossa dalla foto', 'Persona eliminada de la foto')
add('comparison.history',
    'Recent votes', 'Votes récents', 'Letzte Abstimmungen', 'Voti recenti', 'Votos recientes')
add('comparison.no_votes',
    'No votes yet', "Aucun vote pour l'instant", 'Noch keine Stimmen', 'Ancora nessun voto', 'Aún no hay votos')
add('comparison.change_winner',
    'Change the winner', 'Changer le gagnant', 'Gewinner ändern', 'Cambia il vincitore', 'Cambiar el ganador')
add('comparison.delete_vote',
    'Delete this vote', 'Supprimer ce vote', 'Diese Stimme löschen', 'Elimina questo voto', 'Eliminar este voto')
add('comparison.vote_updated',
    'Vote updated', 'Vote mis à jour', 'Stimme aktualisiert', 'Voto aggiornato', 'Voto actualizado')
add('comparison.vote_deleted',
    'Vote deleted', 'Vote supprimé', 'Stimme gelöscht', 'Voto eliminato', 'Voto eliminado')
add('comparison.snapshot_saved',
    'Snapshot #{id} saved', 'Instantané n°{id} enregistré', 'Schnappschuss Nr. {id} gespeichert', 'Istantanea n. {id} salvata', 'Instantánea n.º {id} guardada')
add('gallery.category_changed',
    'Category changed: {old} → {new}', 'Catégorie modifiée : {old} → {new}', 'Kategorie geändert: {old} → {new}', 'Categoria modificata: {old} → {new}', 'Categoría cambiada: {old} → {new}')
add('persons.view',
    'Open', 'Ouvrir', 'Öffnen', 'Apri', 'Abrir')
add('manage_persons.sort.name_asc',
    'Name A–Z', 'Nom A–Z', 'Name A–Z', 'Nome A–Z', 'Nombre A–Z')
add('drawer.fields.require_tags',
    'With any of these tags', "Avec l'un de ces tags", 'Mit einem dieser Tags', 'Con uno di questi tag', 'Con alguna de estas etiquetas')
add('drawer.fields.exclude_tags',
    'Without these tags', 'Sans ces tags', 'Ohne diese Tags', 'Senza questi tag', 'Sin estas etiquetas')
add('sort_options.top_picks_score',
    'Top-picks score', 'Score des meilleures photos', 'Top-Picks-Wert', 'Punteggio top picks', 'Puntuación de las mejores')
add('auth.error',
    'Login failed', 'Échec de la connexion', 'Anmeldung fehlgeschlagen', 'Accesso non riuscito', 'Error de inicio de sesión')
add('auth.invalid_credentials',
    'Invalid credentials', 'Identifiants invalides', 'Ungültige Anmeldedaten', 'Credenziali non valide', 'Credenciales no válidas')
add('category_names.(uncategorized)',
    'Uncategorized', 'Sans catégorie', 'Ohne Kategorie', 'Senza categoria', 'Sin categoría')
add('compare.weights.labels.noise_inv',
    'Noise (inverted)', 'Bruit (inversé)', 'Rauschen (invertiert)', 'Rumore (invertito)', 'Ruido (invertido)')
add('compare.weights.labels.power_points',
    'Power points', 'Points forts', 'Kraftpunkte', 'Punti di forza', 'Puntos de fuerza')
add('compare.weights.labels.quality_score',
    'Quality score', 'Score de qualité', 'Qualitätswert', 'Punteggio di qualità', 'Puntuación de calidad')
add('nav.compare',
    'Weight tuning', 'Réglage des pondérations', 'Gewichtsabstimmung', 'Regolazione dei pesi', 'Ajuste de pesos')
add('person_page.title',
    '{name} - Facet', '{name} - Facet', '{name} - Facet', '{name} - Facet', '{name} - Facet')
add('stats.score_distribution',
    'Score distribution', 'Distribution des scores', 'Bewertungsverteilung', 'Distribuzione dei punteggi', 'Distribución de puntuaciones')
add('tooltip.composition_section',
    'Composition', 'Composition', 'Komposition', 'Composizione', 'Composición')
add('tooltip.face_quality',
    'Face quality', 'Qualité du visage', 'Gesichtsqualität', 'Qualità del volto', 'Calidad facial')
add('gallery.hide_details',
    'Hide details', 'Masquer les détails', 'Details ausblenden',
    'Nascondi dettagli', 'Ocultar detalles')


def main():
    for lang in LANGS:
        path = os.path.join(OUT_DIR, f"{lang}.json")
        existing = {}
        if os.path.exists(path):
            with open(path) as fh:
                existing = json.load(fh)
        merged = dict(existing)
        for key, words in K.items():
            merged[key] = words[lang]
        with open(path, "w") as fh:
            json.dump(dict(sorted(merged.items())), fh, ensure_ascii=False,
                      indent=1)
            fh.write("\n")
        print(f"{lang}: {len(merged)} keys ({len(K)} generated)")



if __name__ == "__main__":
    main()
